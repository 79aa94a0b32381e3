"""Round-5 join profiling: attribute the ~16 ns/row at configs[3].

Times each stage of the general join path separately (checksum-synced,
BENCH-style). Run serially on the TPU (one process!).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gandiva_tpu.ops.hash_join import join, _hash_probe_ranges
from gandiva_tpu.ops.sort import SortKey, normalize_key, _sort_full
from gandiva_tpu.utils.bits import split_i64
from gandiva_tpu.utils.hashing import hash32

NP_ = int(os.environ.get("NPROBE", 100_000_000))
NB = int(os.environ.get("NBUILD", 1_000_000))
ITERS = int(os.environ.get("ITERS", 3))


def timed(name, fn, *args):
    t0 = time.perf_counter()
    r = int(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = int(fn(*args))
    per = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {per*1e3:9.1f} ms  {per/NP_*1e9:7.2f} ns/row  "
          f"(compile {compile_s:.0f}s)  chk={r & 0xffff}", flush=True)
    return per


key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (NP_,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0 / 0.3)).astype(jnp.int64) % NB
build = jnp.arange(NB, dtype=jnp.int64)
probe, build = jax.device_put(probe), jax.device_put(build)
jax.block_until_ready(probe)


# ---- full join --------------------------------------------------------
@jax.jit
def full_join(p, b):
    res = join(p, b, NP_, "inner")
    return (res.count.astype(jnp.int64)
            + jnp.sum(res.probe_idx.astype(jnp.int64))
            + jnp.sum(res.build_idx.astype(jnp.int64)))


timed("full_join", full_join, probe, build)


# ---- probe-ranges only ------------------------------------------------
@jax.jit
def probe_only(p, b):
    kv = jnp.ones((NB,), bool)
    perm, (sorted_keys,), _ = _sort_full([SortKey(b, validity=kv,
                                                  nulls_first=False)], None)
    pk = normalize_key(p)
    lo, ln, uniq = _hash_probe_ranges(pk, sorted_keys, jnp.int32(NB),
                                      jnp.ones((NP_,), bool), perm=perm)
    return (jnp.sum(lo.astype(jnp.int64)) + jnp.sum(ln.astype(jnp.int64))
            + uniq.astype(jnp.int64))


timed("probe_ranges(+build)", probe_only, probe, build)


# ---- build phase only -------------------------------------------------
@jax.jit
def build_only(b):
    kv = jnp.ones((NB,), bool)
    perm, (sorted_keys,), _ = _sort_full([SortKey(b, validity=kv,
                                                  nulls_first=False)], None)
    return jnp.sum(perm.astype(jnp.int64)) + sorted_keys[0].astype(jnp.int64)


timed("build_sort_only", build_only, build)


# ---- normalize + hash over probe --------------------------------------
@jax.jit
def norm_hash(p):
    pk = normalize_key(p).astype(jnp.int64)
    h = hash32(pk)
    plo, phi = split_i64(pk)
    return (jnp.sum(h.astype(jnp.int64)) + jnp.sum(plo) + jnp.sum(phi))


timed("normalize+hash+split", norm_hash, probe)


# ---- the round-1 table gather (dominant suspect) ----------------------
T_ROWS = 64 * 1024 * 1024 + NB   # factor-64 table at 1M build
table = jax.device_put(jnp.zeros((T_ROWS, 4), jnp.int32))


@jax.jit
def r1_gather(p, tbl):
    pk = normalize_key(p).astype(jnp.int64)
    h = (hash32(pk) % jnp.uint32(64 * 1024 * 1024)).astype(jnp.int32)
    got = tbl[h]
    plo, phi = split_i64(pk)
    hit = (got[:, 3] > 0) & (got[:, 0] == plo.view(jnp.int32)) \
        & (got[:, 1] == phi.view(jnp.int32))
    return jnp.sum(hit.astype(jnp.int64)) + jnp.sum(got[:, 2].astype(jnp.int64))


timed("r1_table_gather(16B rows)", r1_gather, probe, table)


# ---- compaction of a ~3%-true mask over NP_ ----------------------------
from gandiva_tpu.ops.compaction import compact_best
from gandiva_tpu.ops.kernels.compaction_pallas import BLOCK

npad = ((NP_ + BLOCK - 1) // BLOCK) * BLOCK


@jax.jit
def compact_sparse(p):
    mask = (p & 31) == 0  # ~3% density
    if npad != NP_:
        mask = jnp.concatenate([mask, jnp.zeros((npad - NP_,), bool)])
    idx, cnt, _ = compact_best(mask)
    return jnp.sum(idx[:1024].astype(jnp.int64)) + cnt.astype(jnp.int64)


timed("compact_mask(3%)", compact_sparse, probe)


# ---- identity fast-expansion cost (approx: the wheres + fit + checksum)
@jax.jit
def expansion_identity(p):
    iota_p = jnp.arange(NP_, dtype=jnp.int32)
    lo = (p & 0xfffff).astype(jnp.int32)
    r = jnp.arange(NP_, dtype=jnp.int32)
    in_rows = r < jnp.int32(NP_)
    probe_out = jnp.where(in_rows, iota_p, -1)
    build_out = jnp.where(in_rows, lo, -1)
    return (jnp.sum(probe_out.astype(jnp.int64))
            + jnp.sum(build_out.astype(jnp.int64)))


timed("identity_expand+checksum", expansion_identity, probe)
print("done")
