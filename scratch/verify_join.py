"""End-to-end verify drive: general join path vs pyarrow.acero oracle."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, pyarrow as pa, pyarrow.compute as pc, pyarrow.acero as acero
import jax.numpy as jnp

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.ops.hash_join import join, gather_payload

rng = np.random.default_rng(7)
NP_, NB = 200_000, 20_000
# duplicate build keys (runs up to ~6), some probe misses, some null keys
probe = rng.integers(0, NB, NP_).astype(np.int64)
build = rng.integers(0, NB // 3, NB).astype(np.int64)   # ~3x dup factor
probe_valid = rng.random(NP_) > 0.05
build_valid = rng.random(NB) > 0.05

# oracle: acero inner hashjoin on the VALID rows (null keys never match)
tp = pa.table({'k': pa.array(probe, mask=~probe_valid),
               'pid': np.arange(NP_, dtype=np.int64)})
tb = pa.table({'k2': pa.array(build, mask=~build_valid),
               'bid': np.arange(NB, dtype=np.int64)})
d = acero.Declaration('hashjoin',
    acero.HashJoinNodeOptions('inner', left_keys='k', right_keys='k2'),
    inputs=[acero.Declaration('table_source', acero.TableSourceNodeOptions(tp)),
            acero.Declaration('table_source', acero.TableSourceNodeOptions(tb))])
oracle = d.to_table()
opairs = set(zip(oracle.column('pid').to_numpy(), oracle.column('bid').to_numpy()))
print("oracle pairs:", len(opairs))

cap = len(opairs) + 1000
res = jax.jit(lambda p, b, pv, bv: join(
    p, b, cap, "inner", probe_valid=pv, build_valid=bv))(
        jnp.asarray(probe), jnp.asarray(build),
        jnp.asarray(probe_valid), jnp.asarray(build_valid))
assert not bool(res.overflow), "overflow"
cnt = int(res.count)
pi = np.asarray(res.probe_idx)[:cnt]
bi = np.asarray(res.build_idx)[:cnt]
mine = set(zip(pi.tolist(), bi.tolist()))
assert len(mine) == cnt, "duplicate output pairs"
assert mine == opairs, f"pair mismatch: {len(mine ^ opairs)} differ"
print(f"inner join row-for-row vs acero OK ({cnt} pairs)")

# left join: unmatched/null-key probe rows must emit with build=-1
resl = jax.jit(lambda p, b, pv, bv: join(
    p, b, cap + NP_, "left", probe_valid=pv, build_valid=bv))(
        jnp.asarray(probe), jnp.asarray(build),
        jnp.asarray(probe_valid), jnp.asarray(build_valid))
cntl = int(resl.count)
pl = np.asarray(resl.probe_idx)[:cntl]; bl = np.asarray(resl.build_idx)[:cntl]
matched_probe = {p for p, _ in opairs}
exp_left = len(opairs) + (NP_ - len(matched_probe))
assert cntl == exp_left, (cntl, exp_left)
null_side = set(pl[bl < 0].tolist())
assert null_side == set(range(NP_)) - matched_probe
print(f"left join OK ({cntl} rows, {len(null_side)} null-extended)")

# filter recipe from the skill (API surface drive)
B = g.TreeExprBuilder
schema = dt.Schema([dt.Field("a", dt.int64), dt.Field("b", dt.float64)])
cond = B.make_condition(B.make_function("greater_than",
    [B.make_field(schema.field("a")), B.make_int64_literal(500)], dt.bool_))
filt = g.make_filter(schema, cond)
batch = pa.RecordBatch.from_arrays(
    [pa.array(np.random.randint(0, 1000, 10000)),
     pa.array(np.random.random(10000))], names=["a", "b"])
sel = filt.evaluate(batch)
exp = np.nonzero(np.asarray(pc.greater(batch.column("a"),
                                       pa.scalar(500)).fill_null(False)))[0]
np.testing.assert_array_equal(sel.to_numpy(), exp)
print("filter recipe OK")
print("VERIFY PASS")
