"""Ablate _probe_ranges_hot stage by stage (16M, fast compiles)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gandiva_tpu.ops.hash_join import (build_join_table,
                                       _compact_with_payloads)
from gandiva_tpu.ops.sort import normalize_key
from gandiva_tpu.utils.bits import split_i64
from gandiva_tpu.utils.hashing import hash32
from gandiva_tpu.utils import shard_compat

NP = int(os.environ.get("NPROBE", 16 * 1024 * 1024))
NB = 1 << 20
ITERS = int(os.environ.get("ITERS", 3))
K = 128

key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (NP,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0 / 0.3)).astype(jnp.int64) % NB
build = jnp.arange(NB, dtype=jnp.int64)
jax.block_until_ready(probe)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    r = int(fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = int(fn(*args))
    per = (time.perf_counter() - t0) / ITERS
    print(f"{name:26s} {per*1e3:9.1f} ms  {per/NP*1e9:7.2f} ns/row "
          f"(compile {c:.0f}s) chk={r & 0xffff}", flush=True)


def staged(stage):
    @jax.jit
    def f(p, b):
        jt = build_join_table(b)
        table = jt.table
        pk_norm = normalize_key(p)
        probe_kv = jnp.ones((NP,), bool)
        T_tot = table.shape[0]
        T = T_tot - NB
        np_ = NP
        pk64 = pk_norm.astype(jnp.int64)
        plo, phi = split_i64(pk64)
        plo_i, phi_i = plo.view(jnp.int32), phi.view(jnp.int32)
        h0p = (hash32(pk64) % jnp.uint32(T)).astype(jnp.int32)
        I64MAX = jnp.int64(2 ** 63 - 1)

        acc = jnp.sum(h0p.astype(jnp.int64))
        if stage < 1:
            return acc
        m = min(65536, np_)
        stride = np_ // m
        samp = jnp.where(probe_kv[::stride][:m], pk64[::stride][:m], I64MAX)
        ss = lax.sort(samp)
        first = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
        iota_s = jnp.arange(m, dtype=jnp.int32)
        sp = jnp.where(first, iota_s, jnp.int32(m))
        nxt = lax.cummin(sp[::-1])[::-1]
        nxt = jnp.concatenate([nxt[1:], jnp.full((1,), m, jnp.int32)])
        cnt_s = jnp.where(first & (ss != I64MAX), nxt - iota_s, 0)
        topv, topi = lax.top_k(cnt_s, K)
        hot64 = ss[topi]
        hot_ok = (topv >= 4) & (hot64 != I64MAX)
        hlo64, hhi64 = split_i64(hot64)
        hlo, hhi = hlo64.view(jnp.int32), hhi64.view(jnp.int32)
        acc = acc + jnp.sum(hot64) + jnp.sum(hot_ok.astype(jnp.int64))
        if stage < 2:
            return acc

        hh = (hash32(hot64) % jnp.uint32(T)).astype(jnp.int32)

        def hcond(s):
            return jnp.logical_and(s[0] < jnp.int32(T_tot), s[4].any())

        def hbody(s):
            i, pos, st, l_, un = s
            g = table[jnp.where(un, pos, 0)]
            occ = g[:, 3] > 0
            hit = occ & (g[:, 0] == hlo) & (g[:, 1] == hhi)
            tk = un & hit
            return (i + 1, pos + 1, jnp.where(tk, g[:, 2], st),
                    jnp.where(tk, g[:, 3], l_), un & occ & ~hit)

        _, _, h_start, h_len, _ = shard_compat.while_loop(
            hcond, hbody, (jnp.int32(0), hh, jnp.zeros((K,), jnp.int32),
                           jnp.zeros((K,), jnp.int32), hot_ok))
        h_lnp1 = jnp.where(hot_ok, h_len + 1, 0)
        acc = acc + jnp.sum(h_start.astype(jnp.int64))
        if stage < 3:
            return acc

        st_hot = jnp.zeros((np_,), jnp.int32)
        lnp1 = jnp.zeros((np_,), jnp.int32)
        for c in range(0, K, 64):
            sl = slice(c, min(c + 64, K))
            eq = (plo_i[:, None] == hlo[None, sl]) \
                & (phi_i[:, None] == hhi[None, sl])
            st_hot = st_hot + jnp.sum(
                jnp.where(eq, h_start[None, sl], 0), axis=1)
            lnp1 = lnp1 + jnp.sum(jnp.where(eq, h_lnp1[None, sl], 0),
                                  axis=1)
        is_hot = lnp1 > 0
        start = jnp.where(is_hot, st_hot, 0)
        ln = jnp.where(is_hot, lnp1 - 1, 0)
        acc = acc + jnp.sum(start.astype(jnp.int64)) + \
            jnp.sum(ln.astype(jnp.int64))
        if stage < 4:
            return acc

        cold = probe_kv & ~is_hot
        C1 = min(np_, max(8192, np_ // 4))
        idx1, n1, packed1 = _compact_with_payloads(cold,
                                                   [h0p, plo_i, phi_i])
        acc = acc + n1.astype(jnp.int64) + \
            jnp.sum(idx1[:1024].astype(jnp.int64))
        if stage < 5:
            return acc

        live1 = jnp.arange(C1, dtype=jnp.int32) < jnp.minimum(
            n1, jnp.int32(C1))
        sel1 = jnp.clip(idx1[:C1].view(jnp.int32), 0, np_ - 1)
        h0p_s = packed1[0][:C1].view(jnp.int32)
        plo_s = packed1[1][:C1].view(jnp.int32)
        phi_s = packed1[2][:C1].view(jnp.int32)
        got = table[jnp.where(live1, h0p_s, 0)]
        occ = got[:, 3] > 0
        hit = occ & (got[:, 0] == plo_s) & (got[:, 1] == phi_s)
        tk1 = live1 & hit
        start_s = jnp.where(tk1, got[:, 2], 0)
        ln_s = jnp.where(tk1, got[:, 3], 0)
        unres_s = live1 & occ & ~hit
        acc = acc + jnp.sum(start_s.astype(jnp.int64))
        if stage < 6:
            return acc

        tgt1 = jnp.where(live1, sel1, jnp.int32(np_))
        start = jnp.concatenate([start, jnp.zeros((1,), jnp.int32)]).at[
            tgt1].set(start_s, mode="drop", indices_are_sorted=True)[:np_]
        ln = jnp.concatenate([ln, jnp.zeros((1,), jnp.int32)]).at[
            tgt1].set(ln_s, mode="drop", indices_are_sorted=True)[:np_]
        acc = acc + jnp.sum(start.astype(jnp.int64)) + \
            jnp.sum(ln.astype(jnp.int64))
        return acc
    return f


for stage, name in [(0, "S0 norm+hash"), (1, "S1 +detect"),
                    (2, "S2 +hotwalk"), (3, "S3 +broadcast"),
                    (4, "S4 +compact"), (5, "S5 +subset r1"),
                    (6, "S6 +scatterback")]:
    timed(name, staged(stage), probe, build)
print("done")
