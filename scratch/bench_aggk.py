"""Compile + bench the Pallas aggregate kernel on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

from gandiva_tpu.ops.kernels import agg_pallas as ak

N = int(os.environ.get("N", 16 * 1024 * 1024))
GROUPS = 64
rng = np.random.default_rng(1)
keys = (rng.integers(0, GROUPS, N).astype(np.int64) * 7 + 3)
vals = rng.integers(-10**12, 10**12, N).astype(np.int64)

kv = np.ones(N, np.int32)
klo = (keys & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
khi = ((keys >> 32) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
vlo = (vals & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
vhi = ((vals >> 32) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

args = [jnp.asarray(x) for x in (kv, klo, khi, vlo, vhi)]

@jax.jit
def run(kv, klo, khi, vlo, vhi):
    tbl, cnt, ovf, per = ak.aggregate_pallas(
        kv, klo, khi, [(vlo, vhi)], [ak.ValueSpec(True, True, False)])
    return tbl, cnt, ovf, per

t0 = time.perf_counter()
tbl, cnt, ovf, per = run(*args)
jax.block_until_ready(per)
print(f"compile+first run: {time.perf_counter()-t0:.1f}s")

iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    tbl, cnt, ovf, per = run(*args)
    int(jnp.asarray(per[0][0][0, 0]))
dt_ = (time.perf_counter() - t0) / iters
print(f"{dt_*1e3:.2f} ms/iter  {N/dt_/1e6:.0f} Mrows/s")

# correctness spot check
cnt = int(cnt); assert int(ovf) == 0, "overflow"
uk = np.asarray(ak.keys_from_table(tbl))[:cnt]
sm = np.asarray(ak.sum_from(per[0][1]))
call, cval = (np.asarray(x) for x in ak.counts_from(per[0][0]))
mn, mx = (np.asarray(x) for x in ak.minmax_from(per[0][2]))
assert cnt == GROUPS, cnt
order = np.argsort(uk)
exp_keys = np.unique(keys)
np.testing.assert_array_equal(uk[order], exp_keys)
import collections
# numpy oracle on a sample of groups
for gi in rng.integers(0, GROUPS, 6):
    k = exp_keys[gi]
    idx = np.where(uk == k)[0][0]
    rows = keys == k
    assert call[idx] == rows.sum(), (call[idx], rows.sum())
    assert sm[idx] == vals[rows].sum(), (sm[idx], vals[rows].sum())
    assert mn[idx] == vals[rows].min()
    assert mx[idx] == vals[rows].max()
print("CORRECT")
