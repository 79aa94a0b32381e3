import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from jax import lax
from gandiva_tpu.ops.kernels import merge_path as mp
from gandiva_tpu.ops.kernels.sort_bitonic import (_run_block_stages,
                                                  _stage_pairs_leaf)

rng = np.random.default_rng(0)
n = 70000
W = 32768
hi = rng.integers(0, 2**32, n, dtype=np.uint32)
bias = jnp.uint32(0x8000_0000)
to_signed = lambda u: (jnp.asarray(u).astype(jnp.uint32) ^ bias).view(jnp.int32)
idx = jnp.arange(n, dtype=jnp.int32)
nw = ((n + W - 1)//W)*W
total = nw + 2*W
pad = total - n
I32M = np.int32(2**31 - 1)
vals = [jnp.concatenate([v, jnp.full((pad,), I32M, jnp.int32)])
        for v in [to_signed(hi), idx]]
vals = _run_block_stages(vals, _stage_pairs_leaf(15), 15, True, num_cmp=2)
v0 = np.asarray(vals[0]); v1 = np.asarray(vals[1])
# leaf check: each block sorted
ok = True
for b in range(total // W):
    blk = v0[b*W:(b+1)*W]
    if not np.all(blk[:-1] <= blk[1:]):
        ok = False; print("leaf block", b, "NOT sorted")
print("leaf blocks sorted:", ok)

meta = mp._round_meta(vals, 2, nw, 15, 0)
meta_np = np.asarray(meta)
print("meta shape", meta_np.shape)
# expected merge-path for pair 0 (runs [0,W) and [W,2W)):
A = v0[:W]; B = v0[W:2*W]
Ai = v1[:W]; Bi = v1[W:2*W]
keyA = A.astype(np.int64) * (1<<31) + Ai  # not exact lex but ok for distinct
merged_exp = np.sort(np.concatenate([v0[:2*W].astype(np.int64)*2**32 + v1[:2*W]]))
for t in range(meta_np.shape[0]):
    a_s, la, b_s, lb = meta_np[t]
    print("tile", t, "a_start", a_s, "la", la, "b_start", b_s, "lb", lb)
# numpy-check tile 0 of pair 0: count of A elems among first K outputs
K = W
both = np.concatenate([v0[:W].astype(np.int64)*2**32 + (v1[:W]+2**31),
                       v0[W:2*W].astype(np.int64)*2**32 + (v1[W:2*W]+2**31)])
order = np.argsort(both, kind="stable")
a0_exp = int(np.sum(order[:K] < W))
print("expected a0 tile0:", a0_exp, "meta says:", meta_np[0,1] if meta_np[0,0]==0 else "?")
