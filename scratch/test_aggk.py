import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

from gandiva_tpu.ops.kernels import agg_pallas as ak

rng = np.random.default_rng(0)
N = 4096
keys = rng.integers(-5, 6, N).astype(np.int64) * (10**10)
vals = rng.integers(-10**12, 10**12, N).astype(np.int64)
kvalid = rng.random(N) > 0.1
rvalid = rng.random(N) > 0.05
vvalid = rng.random(N) > 0.2

kv = np.where(~rvalid, 0, np.where(kvalid, 1, 2)).astype(np.int32)
klo = (keys & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
khi = ((keys >> 32) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
vlo = (vals & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
vhi = ((vals >> 32) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

tbl, cnt, ovf, per = ak.aggregate_pallas(
    jnp.asarray(kv), jnp.asarray(klo), jnp.asarray(khi),
    [(jnp.asarray(vlo), jnp.asarray(vhi), jnp.asarray(vvalid.astype(np.int32)))],
    [ak.ValueSpec(True, True, True)], interpret=True)

cnt = int(cnt); ovf = int(ovf)
uk = np.asarray(ak.keys_from_table(tbl))[:cnt]
call, cval = (np.asarray(x) for x in ak.counts_from(per[0][0]))
sm = np.asarray(ak.sum_from(per[0][1]))
mn, mx = (np.asarray(x) for x in ak.minmax_from(per[0][2]))

# reference with numpy
mask1 = rvalid & kvalid
exp_keys = np.unique(keys[mask1])
assert ovf == 0
assert cnt == len(exp_keys), (cnt, len(exp_keys))
assert set(uk) == set(exp_keys), (sorted(uk), exp_keys)
ok = True
for i, k in enumerate(uk):
    rows = mask1 & (keys == k)
    vrows = rows & vvalid
    if call[i] != rows.sum(): print("count_all", k, call[i], rows.sum()); ok=False
    if cval[i] != vrows.sum(): print("count_val", k, cval[i], vrows.sum()); ok=False
    if sm[i] != vals[vrows].sum(): print("sum", k, sm[i], vals[vrows].sum()); ok=False
    if vrows.any():
        if mn[i] != vals[vrows].min(): print("min", k, mn[i], vals[vrows].min()); ok=False
        if mx[i] != vals[vrows].max(): print("max", k, mx[i], vals[vrows].max()); ok=False
    else:
        if mn[i] != 2**63-1: print("min empty", mn[i]); ok=False
        if mx[i] != -2**63: print("max empty", mx[i]); ok=False
# null group at slot G
nrows = rvalid & ~kvalid
nv = nrows & vvalid
g = ak.G
if call[g] != nrows.sum(): print("null count_all", call[g], nrows.sum()); ok=False
if cval[g] != nv.sum(): print("null count_val", cval[g], nv.sum()); ok=False
if sm[g] != vals[nv].sum(): print("null sum", sm[g], vals[nv].sum()); ok=False
print("OK" if ok else "FAILED")
