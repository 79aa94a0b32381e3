import sys; sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa, pyarrow.compute as pc
import jax
import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
B = g.TreeExprBuilder
schema = dt.Schema([dt.Field("a", dt.int64), dt.Field("b", dt.float64)])
cond = B.make_condition(B.make_function("greater_than",
    [B.make_field(schema.field("a")), B.make_int64_literal(500)], dt.bool_))
proj = [B.make_expression(B.make_function("add",
    [B.make_function("multiply", [B.make_field(schema.field("b")),
                                  B.make_double_literal(2.0)], dt.float64),
     B.make_function("castFLOAT8", [B.make_field(schema.field("a"))],
                     dt.float64)], dt.float64), dt.Field("out", dt.float64))]
from gandiva_tpu.compiler.projector import FilterProject
fp = FilterProject.make(schema, cond, proj)
rng = np.random.default_rng(3)
n = 100_000
av = rng.integers(0, 1000, n)
amask = rng.random(n) < 0.05
bv = rng.random(n)
batch = pa.RecordBatch.from_arrays(
    [pa.array(np.where(amask, None, av), type=pa.int64()), pa.array(bv)],
    names=["a", "b"])
sel, outs = fp.evaluate(batch)
keep = np.asarray(pc.fill_null(pc.greater(batch.column("a"), pa.scalar(500)), False))
exp = bv[keep] * 2.0 + av[keep]
got = outs[0].to_numpy(zero_copy_only=False)
np.testing.assert_allclose(got, exp, rtol=1e-12)
np.testing.assert_array_equal(sel.to_numpy(), np.nonzero(keep)[0])
print("filter_project drive ok:", len(got), "rows, backend", jax.default_backend())
