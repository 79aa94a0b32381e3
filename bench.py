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
    """configs[0], device-resident streaming: K batches evaluated per host
    round-trip via ONE lax.scan (FilterProject.stream_fn), each batch's
    outputs reduced to scalar checksums on device so nothing but one scalar
    crosses the tunnel per call. Rows/s = K·N / per-call wall time."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gandiva_tpu.entrypoints import flagship_stream

    # r5: 4 batches of 64M (256M rows/call) measured 1015 vs 962 Mrows/s
    # for 16x16M — larger batches amortize the per-batch fixed costs
    # (compaction block chain); K x n resident inputs are ~4.6 GB
    K = int(os.environ.get("BENCH_STREAM_BATCHES", 4))
    jfn, make_inputs = flagship_stream()
    cols = make_inputs(K, n, seed=42)

    int(jfn(cols))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        int(jfn(cols))
    per_iter = (time.perf_counter() - t0) / iters
    return K * n / per_iter


def bench_hash_aggregate(n, iters, groups=64, values: str = "float"):
    """configs[1]: GROUP BY int64 key, sum+count+min+max over FLOAT values —
    the baseline workload aggregates floats (bench_reference/
    bench_arrow.py:36: val=rng.random(N), hash_min_max). CPU baseline:
    127.6 Mrows/s (threaded Acero). ``values="int"`` records the int64
    variant as a secondary line (VERDICT r4 weak #2)."""
    import jax
    import jax.numpy as jnp

    from gandiva_tpu.ops.hash_aggregate import hash_aggregate

    @jax.jit
    def run(keys, vals):
        res = hash_aggregate(keys, [("v", "sum"), ("v", "count"),
                                    ("v", "min"), ("v", "max")],
                             {"v": (vals, None)}, max_groups=groups)
        return (res["group_count"].astype(jnp.int64)
                + jnp.sum(res["agg:v:sum"]).astype(jnp.int64)
                + jnp.sum(res["agg:v:count"])
                + jnp.sum(res["agg:v:min"]).astype(jnp.int64)
                + jnp.sum(res["agg:v:max"]).astype(jnp.int64))

    key = jax.random.PRNGKey(1)
    keys = jax.random.randint(key, (n,), 0, groups, dtype=jnp.int64) * 7 + 3
    if values == "float":
        vals = jax.random.uniform(key, (n,), dtype=jnp.float64)
    else:
        vals = jax.random.randint(key, (n,), -1000, 1000, dtype=jnp.int64)
    int(run(keys, vals))
    t0 = time.perf_counter()
    for _ in range(iters):
        int(run(keys, vals))
    return n / ((time.perf_counter() - t0) / iters)


def bench_sort(n, iters):
    """configs[2]: 64-bit keys + payload. CPU baseline: 1.3 Mrows/s."""
    import jax
    import jax.numpy as jnp

    from gandiva_tpu.ops.sort import SortKey, sort_columns

    @jax.jit
    def run(keys, payload):
        perm, sk, sp = sort_columns([SortKey(keys)], [payload])
        return sk[0][0] + sp[0][-1] + perm.astype(jnp.int64)[0]

    key = jax.random.PRNGKey(2)
    keys = jax.random.randint(key, (n,), -(2 ** 62), 2 ** 62,
                              dtype=jnp.int64)
    payload = jax.random.randint(key, (n,), 0, 10 ** 9, dtype=jnp.int64)
    int(run(keys, payload))
    t0 = time.perf_counter()
    for _ in range(iters):
        int(run(keys, payload))
    return n / ((time.perf_counter() - t0) / iters)


def bench_join(n_probe, n_build, iters, unique=None):
    """configs[3]: inner join, Zipf(1.3) probe × unique build — the exact
    shape of bench_reference/bench_join.py (probe = zipf(1.3) % n_build,
    build = arange(n_build)). CPU baseline: 3.4 Mrows/s probe (threaded
    Acero, 100M×1M).

    Measures the GENERAL hash-range probe (no build_unique assumption) by
    default; set BENCH_JOIN_UNIQUE=1 for the PK-FK fast path. Zipf keys are
    generated on device by inverse-transform: floor(U^(-1/(s-1))) has
    P(X>=k) = k^-(s-1), i.e. pmf ~ k^-s — the same tail law the reference
    bench draws with numpy's rng.zipf(1.3)."""
    import jax
    import jax.numpy as jnp

    from gandiva_tpu.ops.hash_join import join

    if unique is None:
        unique = os.environ.get("BENCH_JOIN_UNIQUE", "0") == "1"

    @jax.jit
    def run(probe, build):
        res = join(probe, build, n_probe, "inner", build_unique=unique)
        return (res.count.astype(jnp.int64)
                + jnp.sum(res.probe_idx.astype(jnp.int64))
                + jnp.sum(res.build_idx.astype(jnp.int64))
                + jnp.where(res.overflow, jnp.int64(-1), 0))

    key = jax.random.PRNGKey(3)
    # Zipf(1.3) via Pareto-floor; clamp u so u^-(1/0.3) stays in f32 range
    u = jax.random.uniform(key, (n_probe,), minval=1e-5, maxval=1.0)
    probe = (u ** (-1.0 / 0.3)).astype(jnp.int64) % n_build
    build = jnp.arange(n_build, dtype=jnp.int64)
    int(run(probe, build))
    t0 = time.perf_counter()
    for _ in range(iters):
        int(run(probe, build))
    return n_probe / ((time.perf_counter() - t0) / iters)


def bench_join_full(n_probe_total, n_build, iters):
    """configs[3] at FULL scale (1B probe × 10M build): the probe side
    cannot be device-resident (8 GB of keys), so the join runs through the
    build-once/probe-many streaming path (ops/hash_join.join_stream):
    JoinTable built once, K chunks generated on device under the scan
    (Zipf(1.3) via the same inverse-transform as bench_join) and reduced
    to checksums — zero host round-trips inside one jit call."""
    import jax
    import jax.numpy as jnp

    from gandiva_tpu.ops.hash_join import join_stream

    K = int(os.environ.get("BENCH_JOIN_CHUNKS", 16))
    n = max(1, n_probe_total // K)
    build = jnp.arange(n_build, dtype=jnp.int64)

    def chunk_fn(i):
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        u = jax.random.uniform(key, (n,), minval=1e-5, maxval=1.0)
        return (u ** (-1.0 / 0.3)).astype(jnp.int64) % n_build

    def consume(res):
        return (res.count.astype(jnp.int64)
                + jnp.sum(res.probe_idx.astype(jnp.int64))
                + jnp.sum(res.build_idx.astype(jnp.int64)))

    run = jax.jit(join_stream(build, K, chunk_fn=chunk_fn, capacity=n,
                              how="inner", consume=consume))

    def call():
        outs, ovf = run()
        return int(jnp.sum(outs) + jnp.where(ovf, jnp.int64(-1), 0))

    call()
    t0 = time.perf_counter()
    for _ in range(iters):
        call()
    return K * n / ((time.perf_counter() - t0) / iters)


def main():
    """Run ALL four BASELINE configs (or a single BENCH_OP) and print one
    JSON line per operator plus a final combined line for the driver — the
    combined object carries every config's rows/s and vs_baseline so
    BENCH_r{N}.json is reviewable against BASELINE.md in one place."""
    _enable_compile_cache()
    iters = int(os.environ.get("BENCH_ITERS", 5))
    only = os.environ.get("BENCH_OP", "all")
    n_env = os.environ.get("BENCH_ROWS")

    def rows(default):
        return int(n_env) if n_env else default

    MI = 1024 * 1024
    # Essential-bytes-per-row models for the roofline column: the HBM
    # traffic an IDEAL implementation of each operator must move (inputs
    # once + essential outputs), NOT what this implementation moves.
    # v5e HBM ~819 GB/s. filter+project: a i64 + b f64 in, selection u32 +
    # projected f64 out at ~50% selectivity -> 16 + 6 = 22. agg: keys+vals
    # in, output negligible -> 16. sort: keys+payload read AND written once
    # -> 32. join: probe keys in + (probe_idx, build_idx) out -> 16.
    HBM_BYTES_PER_S = 819e9
    plans = {
        # op: (runner, default_rows, CPU-baseline rows/s — BASELINE.md,
        #      essential bytes/row)
        "filter_project": (lambda n: bench_filter_project(n, iters),
                           64 * MI, 23.7e6, 22),
        "agg": (lambda n: bench_hash_aggregate(n, iters),
                100_000_000, 127.6e6, 16),
        # int64-value variant (r4's headline), kept as a secondary line
        "agg_int": (lambda n: bench_hash_aggregate(n, iters, values="int"),
                    100_000_000, 127.6e6, 16),
        "sort": (lambda n: bench_sort(n, iters), 100_000_000, 1.3e6, 32),
        "join": (lambda n: bench_join(
            n, int(os.environ.get("BENCH_BUILD_ROWS", 1024 * 1024)), iters),
            100_000_000, 3.4e6, 16),
        # the PK-FK declared-unique path (build_unique=True), recorded
        # alongside the general path per VERDICT r3; same CPU baseline
        "join_unique": (lambda n: bench_join(
            n, int(os.environ.get("BENCH_BUILD_ROWS", 1024 * 1024)), iters,
            unique=True),
            100_000_000, 3.4e6, 16),
        # FULL-SCALE configs[3] (1B×10M) via the streaming build-once/
        # probe-many path; CPU baseline is the 10x-scaled-down measurement
        # (BASELINE.md: "rerun at full scale on the pod"), so vs_baseline
        # here is conservative
        "join_full": (lambda n: bench_join_full(
            n, int(os.environ.get("BENCH_FULL_BUILD_ROWS", 10_000_000)),
            max(1, iters // 2)),
            1_024_000_000, 3.4e6, 16),
    }
    selected = list(plans) if only == "all" else [only]
    results = {}
    for op in selected:
        runner, default_n, baseline, bpr = plans[op]
        try:
            rows_per_s = runner(rows(default_n))
        except Exception as e:  # surface per-op failures, keep benching
            print(json.dumps({"metric": f"{op}_rows_per_s", "value": 0,
                              "unit": "rows/s", "vs_baseline": 0,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            results[op] = {"rows_per_s": 0, "vs_baseline": 0}
            continue
        pct_roofline = 100.0 * rows_per_s * bpr / HBM_BYTES_PER_S
        line = {"metric": f"{op}_rows_per_s", "value": rows_per_s,
                "unit": "rows/s", "vs_baseline": rows_per_s / baseline,
                "pct_hbm_roofline": round(pct_roofline, 2)}
        print(json.dumps(line), flush=True)
        results[op] = {"rows_per_s": rows_per_s,
                       "vs_baseline": rows_per_s / baseline,
                       "pct_hbm_roofline": round(pct_roofline, 2)}
    if len(selected) > 1:
        ratios = [r["vs_baseline"] for r in results.values()]
        geomean = (float(__import__("math").prod(ratios)) ** (1 / len(ratios))
                   if all(r > 0 for r in ratios) else 0.0)
        print(json.dumps({
            "metric": "all_ops_vs_baseline_geomean", "value": geomean,
            "unit": "x", "vs_baseline": geomean, "configs": results,
        }), flush=True)


if __name__ == "__main__":
    main()
