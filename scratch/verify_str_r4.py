import sys; sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa
import jax
import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.registry import string_ops as so
print("backend:", jax.default_backend(), flush=True)
B = g.TreeExprBuilder

# high-cardinality concat (force row mode with the real cap: 1100x1100 > 2^20)
rng = np.random.default_rng(9)
n = 2000
a = [f"user-{rng.integers(0, 10**12)}" for _ in range(n)]   # ~2000 distinct
b = [f"dom-{rng.integers(0, 10**12)}" for _ in range(n)]
so_cap = so.MAX_PRODUCT_DICT
so.MAX_PRODUCT_DICT = 1024   # force the fallback without 1M-entry dicts
schema = dt.Schema([dt.Field("a", dt.string), dt.Field("b", dt.string)])
batch = pa.RecordBatch.from_arrays([pa.array(a), pa.array(b)],
                                   names=["a", "b"])
expr = B.make_expression(B.make_function(
    "concat", [B.make_field(schema.field("a")),
               B.make_field(schema.field("b"))], dt.string),
    dt.Field("r", dt.string))
(r,) = g.make_projector(schema, [expr], use_cache=False).evaluate(batch)
assert r.to_pylist() == [x + y for x, y in zip(a, b)]
so.MAX_PRODUCT_DICT = so_cap
print("high-cardinality concat ok (2000 rows, row-dictionary mode)")

# castVARCHAR(computed) on TPU
schema2 = dt.Schema([dt.Field("x", dt.int64)])
vals = rng.integers(-10**6, 10**6, 5000)
batch2 = pa.RecordBatch.from_arrays([pa.array(vals)], names=["x"])
computed = B.make_function("multiply", [B.make_field(schema2.field("x")),
                                        B.make_int64_literal(3)], dt.int64)
e2 = B.make_expression(B.make_function("castVARCHAR", [computed], dt.string),
                       dt.Field("r", dt.string))
(r2,) = g.make_projector(schema2, [e2], use_cache=False).evaluate(batch2)
assert r2.to_pylist() == [str(int(v) * 3) for v in vals]
print("castVARCHAR(computed int64) ok (5000 rows, prepass)")
print("ALL STRING DRIVES PASSED")
