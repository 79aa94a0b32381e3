import sys; sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa, pyarrow.compute as pc
import jax, jax.numpy as jnp
import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.ops.sort import SortKey, sort_columns

print("backend:", jax.default_backend(), flush=True)

# 1) user-style filter drive (unchanged surface still works on TPU)
B = g.TreeExprBuilder
schema = dt.Schema([dt.Field("a", dt.int64), dt.Field("b", dt.float64)])
cond = B.make_condition(B.make_function("greater_than",
    [B.make_field(schema.field("a")), B.make_int64_literal(500)], dt.bool_))
filt = g.make_filter(schema, cond)
rng = np.random.default_rng(0)
batch = pa.RecordBatch.from_arrays(
    [pa.array(rng.integers(0, 1000, 10000)),
     pa.array(rng.random(10000))], names=["a", "b"])
sel = filt.evaluate(batch)
exp = np.nonzero(np.asarray(pc.greater(batch.column("a"), pa.scalar(500)).fill_null(False)))[0]
np.testing.assert_array_equal(sel.to_numpy(), exp)
print("filter drive ok", flush=True)

# 2) merge-path sort drive on TPU: nullable key + payloads, vs pyarrow
n = 2_000_000
keys = rng.integers(-2**62, 2**62, n)
mask = rng.random(n) < 0.1
pay = rng.integers(0, 10**9, n)
kj = jnp.asarray(keys); vj = jnp.asarray(~mask); pj = jnp.asarray(pay)
perm, sk, sp = jax.jit(lambda k, v, p: sort_columns(
    [SortKey(k, validity=v)], [p]))(kj, vj, pj)
arr = pa.array(np.where(mask, None, keys), type=pa.int64())
idx = np.asarray(pc.sort_indices(arr, null_placement="at_start"))
np.testing.assert_array_equal(np.asarray(perm), idx)
np.testing.assert_array_equal(np.asarray(sp[0]), pay[idx])
np.testing.assert_array_equal(np.asarray(sk[0]), keys[idx])  # carried values
print("nullable sort drive ok (2M, nulls-first, payload carried)", flush=True)

# 3) descending + multi-key drive
k2 = rng.integers(0, 50, n)
perm2, sk2, _ = jax.jit(lambda a, b: sort_columns(
    [SortKey(a, ascending=False), SortKey(b)], []))(jnp.asarray(k2), kj)
tbl = pa.table({"x": k2, "y": keys})
idx2 = np.asarray(pc.sort_indices(tbl, sort_keys=[("x", "descending"), ("y", "ascending")]))
np.testing.assert_array_equal(np.asarray(perm2), idx2)
print("multi-key desc sort drive ok", flush=True)

# 4) decimal plan round-trip at full 38-digit precision (ADVICE fix)
from gandiva_tpu.plan import dump_plan, load_plan, PlanError
big = "12345678901234567890123456789012345678"
sch = dt.Schema([dt.Field("d", dt.decimal128(38, 0))])
lit = B.make_decimal_literal(big, 38, 0)
e = B.make_expression(B.make_function("add",
    [B.make_field(sch.field("d")), lit], dt.decimal128(38, 0)),
    dt.Field("out", dt.decimal128(38, 0)))
doc = dump_plan(sch, [e])
p2 = load_plan(doc)
assert p2.expressions[0].root.to_string() == e.root.to_string(), \
    (p2.expressions[0].root.to_string(), e.root.to_string())
print("decimal128 38-digit plan round-trip ok", flush=True)

# 5) PlanError contract
try:
    load_plan({"schema": [], "expressions": [{"root": {"function": {}}}]})
    raise SystemExit("expected PlanError")
except PlanError as err:
    print("PlanError ok:", err, flush=True)
print("ALL VERIFY DRIVES PASSED")
