import sys; sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa
import jax
import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
print("backend:", jax.default_backend(), flush=True)
B = g.TreeExprBuilder

# interval arithmetic on TPU
schema = dt.Schema([dt.Field("t", dt.timestamp)])
base = 1_600_000_000_000
batch = pa.RecordBatch.from_arrays(
    [pa.array([base, base + 1], type=pa.timestamp("ms"))], names=["t"])
iv = B.make_interval_day_literal(3, 7_200_000)
expr = B.make_expression(B.make_function(
    "add", [B.make_field(schema.field("t")), iv], dt.timestamp),
    dt.Field("r", dt.timestamp))
(r,) = g.make_projector(schema, [expr], use_cache=False).evaluate(batch)
assert r.cast(pa.int64()).to_pylist() == [base + 3*86_400_000 + 7_200_000,
                                          base + 1 + 3*86_400_000 + 7_200_000]
print("interval arithmetic ok")

# signatures incl alias
names = {s.name for s in g.get_registered_function_signatures()}
assert {"hash", "castINTERVALDAY", "castINTERVALYEAR"} <= names
print("signatures ok,", len(names), "names")

# profile hook on TPU
import tempfile, os
schema2 = dt.Schema([dt.Field("a", dt.int64)])
e2 = B.make_expression(B.make_function(
    "add", [B.make_field(schema2.field("a")), B.make_int64_literal(1)],
    dt.int64), dt.Field("out", dt.int64))
p2 = g.make_projector(schema2, [e2], use_cache=False)
from gandiva_tpu.batch import from_arrow
b2 = from_arrow(pa.RecordBatch.from_arrays([pa.array(np.arange(100_000))],
                                           names=["a"]))
d = p2.profile(b2)
nfiles = sum(len(fs) for _, _, fs in os.walk(d))
print("profile trace ok:", nfiles, "files in", d)
print("ALL MISC DRIVES PASSED")
