"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: rows/s on the BASELINE configs[0] query (filter ``a>500`` +
project ``b*2+castFLOAT8(a)`` over nullable int64/float64), steady-state on
one TPU chip, data device-resident.

Measurement protocol: this environment reaches the TPU through a tunnel with
30-80 ms host↔device round-trip latency, and large outputs transfer back
eagerly — so per-call wall timing measures the tunnel, not the chip. The
harness therefore runs K iterations inside one device-side ``lax.scan`` (each
iteration sees perturbed inputs so nothing hoists), reduces every output to
scalar checksums (all buffers still computed — the selection vector, the
gathered projection), and divides one fetch-synchronized wall time by K.

CPU reference baseline (BASELINE.md): 23.7 Mrows/s single-thread Acero.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_ROWS_PER_S = 23.7e6  # BASELINE.md configs[0]


def _enable_compile_cache():
    """Persistent XLA compilation cache — plays the role LLVM-module
    caching plays in the reference (SURVEY.md §5.4): Make-time cost is paid
    once per (shapes, program), across processes."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_filter_project(n, iters):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gandiva_tpu.entrypoints import flagship_step

    fn, _ = flagship_step()

    def one(a, av, b, bv):
        sel_idx, sel_count, out_val, out_valid = fn(a, av, b, bv)
        # scalar checksums force materialization of every stage
        return (sel_count.astype(jnp.int64)
                + jnp.sum(sel_idx.astype(jnp.int64))
                + jnp.sum(out_val).astype(jnp.int64)
                + jnp.sum(out_valid.astype(jnp.int64)))

    from functools import partial

    @partial(jax.jit, static_argnums=(4,))
    def run(a, av, b, bv, k):
        def body(carry, j):
            # perturb the key column so no iteration can be hoisted/cached
            chk = one(a + j.astype(a.dtype), av, b, bv)
            return carry + chk, None
        total, _ = lax.scan(body, jnp.int64(0), jnp.arange(k))
        return total

    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    a = jax.random.randint(k1, (n,), 0, 1000, dtype=jnp.int64)
    b = jax.random.uniform(k2, (n,), dtype=jnp.float64)
    av = jnp.ones(n, dtype=bool)
    bv = jnp.ones(n, dtype=bool)

    # warmup/compile (fetch forces completion through the tunnel)
    int(run(a, av, b, bv, 1))
    base_t = []
    for _ in range(2):
        t0 = time.perf_counter()
        int(run(a, av, b, bv, 1))
        base_t.append(time.perf_counter() - t0)
    int(run(a, av, b, bv, iters))  # compile the K-iter variant
    t0 = time.perf_counter()
    int(run(a, av, b, bv, iters))
    t_iters = time.perf_counter() - t0
    # subtract the 1-iteration wall floor (tunnel latency + one pass),
    # attribute the remainder to the extra (iters-1) device passes
    per_iter = (t_iters - min(base_t)) / (iters - 1)
    return n / per_iter


def main():
    _enable_compile_cache()
    n = int(os.environ.get("BENCH_ROWS", 16 * 1024 * 1024))
    iters = int(os.environ.get("BENCH_ITERS", 21))
    rows_per_s = bench_filter_project(n, iters)
    print(json.dumps({
        "metric": "filter_project_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s",
        "vs_baseline": rows_per_s / BASELINE_ROWS_PER_S,
    }))


if __name__ == "__main__":
    main()
