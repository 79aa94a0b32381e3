"""Multi-operator distributed pipeline (BASELINE configs[4]).

Composes the engine end-to-end the way Dremio composes Gandiva kernels into
fragment pipelines (SURVEY.md §3.5): per shard — expression-engine filter →
skew-aware hash join → hash aggregate → global sort of the (small) group
results — all inside ONE ``shard_map``-ed jit program, so XLA overlaps the
all_to_all exchanges with local compute (north_star: 'exchange overlapped
with compute via async ICI collectives').

Per-operator observability (SURVEY.md §5.5): the step returns a metrics dict
(rows in/out per operator, shuffle overflow flags) alongside the results —
the engine's rows/s accounting surface.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sort import SortKey, normalize_key
from . import mesh as meshmod
from .ops import dist_hash_aggregate, dist_join_skewed

AXIS = meshmod.PARTITION_AXIS


_PIPELINE_CACHE: Dict[tuple, object] = {}


def build_filter_join_agg_sort(mesh: Mesh, nper: int, build_per: int,
                               num_groups: int = 64,
                               filter_threshold: int = 50,
                               shuffle_factor: int = 3,
                               out_factor: int = 4,
                               num_hot: int = 64,
                               hot_capacity: int = 2048):
    """Compile the canonical pipeline over ``mesh``. Memoized on
    (mesh, every shape/config param) so steady-state queries reuse the
    cached jit — a fresh closure per call would retrace and recompile,
    charging compile time to every run's wall clock."""
    cache_key = (mesh, nper, build_per, num_groups, filter_threshold,
                 shuffle_factor, out_factor, num_hot, hot_capacity)
    hit = _PIPELINE_CACHE.get(cache_key)
    if hit is not None:
        return hit
    fn = _build_filter_join_agg_sort(mesh, nper, build_per, num_groups,
                                     filter_threshold, shuffle_factor,
                                     out_factor, num_hot, hot_capacity)
    _PIPELINE_CACHE[cache_key] = fn
    return fn


def _build_filter_join_agg_sort(mesh: Mesh, nper: int, build_per: int,
                                num_groups: int = 64,
                                filter_threshold: int = 50,
                                shuffle_factor: int = 3,
                                out_factor: int = 4,
                                num_hot: int = 64,
                                hot_capacity: int = 2048):
    """Build + jit the canonical pipeline over ``mesh``.

    Query shape (TPC-H-flavored):
        SELECT g.seg, SUM(o.amt), COUNT(*)
        FROM orders o JOIN dim g ON o.key = g.key
        WHERE o.amt > threshold
        GROUP BY g.seg ORDER BY g.seg

    Inputs per shard: orders (key, amt) of nper rows, dim (key, seg) of
    build_per rows, all sharded over the partition axis. Returns a jitted
    fn(ok, oa, dk, ds) → (seg_sorted, sums, counts, n_groups, metrics).
    """
    probe_cap = shuffle_factor * nper
    out_cap = out_factor * nper
    build_cap = max(128, shuffle_factor * build_per)
    G = num_groups

    def shard_fn(ok_, oa, dk, ds):
        n = ok_.shape[0]
        metrics = {}
        metrics["rows_in"] = jnp.int64(n)

        # 1. filter (expression-engine mask; padding-free inputs here)
        keep = oa > filter_threshold
        metrics["filter_out"] = jnp.sum(keep.astype(jnp.int64))
        n_keep = metrics["filter_out"]

        # 2. skew-aware join orders ⋈ dim
        res, cols, row_ok, ov_join = dist_join_skewed(
            ok_, keep, {"amt": (oa, None)},
            dk, jnp.ones_like(dk, dtype=bool), {"seg": (ds, None)},
            AXIS, probe_capacity=probe_cap, build_capacity=build_cap,
            out_capacity=out_cap, how="inner", num_hot=num_hot,
            hot_replicate_capacity=min(hot_capacity, dk.shape[0]))
        amt, amt_ok = cols["amt"]
        seg, seg_ok = cols["seg"]
        joined_ok = row_ok & amt_ok & seg_ok
        metrics["join_out"] = jnp.sum(joined_ok.astype(jnp.int64))

        # 3. aggregate by seg (second shuffle: co-locate groups)
        agg = dist_hash_aggregate(
            seg, joined_ok, {"amt": (amt, None)},
            [("amt", "sum"), ("amt", "count")],
            AXIS, capacity=out_cap, max_groups=G)
        metrics["agg_groups"] = agg["group_count"].astype(jnp.int64)
        overflow = ov_join | agg["overflow"]

        # bytes shuffled over ICI (SURVEY.md §5.5) — documented UPPER BOUND:
        # counts every surviving probe row through the join exchange (key
        # i64 + amt payload) and every joined row through the aggregate
        # exchange (seg i64 + amt), with validity as one byte per row.
        # Actual ICI traffic is lower: hot-key probe rows are served from
        # the replicated build table and never enter the all_to_all, and
        # rows hashed to their own shard stay on-chip.
        row_bytes_join = 8 + oa.dtype.itemsize + 1
        row_bytes_agg = 8 + amt.dtype.itemsize + 1
        metrics["bytes_shuffled"] = (
            n_keep * row_bytes_join
            + metrics["join_out"] * row_bytes_agg)

        # 4. global sort of group rows (tiny): gather every shard's groups
        gkeys = agg["keys"][:G]
        gsum = agg["agg:amt:sum"][:G]
        gcount = agg["agg:amt:count"][:G]
        present = jnp.arange(G) < agg["group_count"]
        all_keys = lax.all_gather(gkeys, AXIS, tiled=True)
        all_sum = lax.all_gather(gsum, AXIS, tiled=True)
        all_count = lax.all_gather(gcount, AXIS, tiled=True)
        all_present = lax.all_gather(present, AXIS, tiled=True)
        order = lax.sort((jnp.logical_not(all_present),
                          normalize_key(all_keys),
                          jnp.arange(all_keys.shape[0], dtype=jnp.int32)),
                         num_keys=2, is_stable=True)[-1]
        skeys = all_keys[order]
        ssum = all_sum[order]
        scount = all_count[order]
        n_groups = jnp.sum(all_present.astype(jnp.int32))
        metrics = {k: v[None] for k, v in metrics.items()}
        return (skeys, ssum, scount, n_groups[None], overflow[None], metrics)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS),) * 4,
        out_specs=(P(), P(), P(), P(AXIS), P(AXIS),
                   {k: P(AXIS) for k in ["rows_in", "filter_out",
                                         "join_out", "agg_groups",
                                         "bytes_shuffled"]}),
        # the sorted group table is identical on every shard (all_gather +
        # deterministic local sort) but the checker can't infer that
        check_vma=False)
    return jax.jit(fn)


class PipelineOverflowError(RuntimeError):
    """Capacity overflow surfaced from a fixed-capacity exchange — the
    Status-style contract (SURVEY.md §5.3): device code never resizes;
    it flags, and the host retries with doubled capacity."""


def run_pipeline(jitted, orders_key, orders_amt, dim_key, dim_seg,
                 mesh: Mesh):
    """Host driver: shard inputs, run, unpack results + metrics.

    Metrics (SURVEY.md §5.5): per-operator row counts, bytes_shuffled
    (summed over shards), wall_time_s and rows_per_s for the whole step
    (fetch-synchronized; per-operator wall time inside ONE fused XLA
    program is not separable — per-plan timing lives on each compiled
    plan's ``stats``)."""
    import time

    sh = NamedSharding(mesh, P(AXIS))
    args = [jax.device_put(jnp.asarray(x), sh)
            for x in (orders_key, orders_amt, dim_key, dim_seg)]
    t0 = time.perf_counter()
    skeys, ssum, scount, n_groups, overflow, metrics = jitted(*args)
    n_groups_h = np.asarray(n_groups)          # fetch = sync point
    wall = time.perf_counter() - t0
    ng = int(n_groups_h[0])
    if bool(np.asarray(overflow).any()):
        raise PipelineOverflowError(
            "pipeline capacity overflow — rerun with larger "
            "shuffle_factor/out_factor")
    host_metrics = {k: int(np.asarray(v).sum()) for k, v in metrics.items()}
    host_metrics["wall_time_s"] = wall
    host_metrics["rows_per_s"] = host_metrics["rows_in"] / max(wall, 1e-9)
    return (np.asarray(skeys)[:ng], np.asarray(ssum)[:ng],
            np.asarray(scount)[:ng], host_metrics)


def run_pipeline_with_retry(mesh: Mesh, orders_key, orders_amt, dim_key,
                            dim_seg, num_groups: int = 64,
                            filter_threshold: int = 50,
                            shuffle_factor: int = 3, out_factor: int = 4,
                            max_retries: int = 3, **kw):
    """Overflow→retry driver (SURVEY.md §7 hard part #1): compile + run the
    pipeline; on a capacity-overflow flag, double both capacity factors and
    recompile (the reference's Status-propagation analogue — the retry is a
    HOST decision, device programs stay static-shaped). Each retry costs one
    recompile; steady-state queries land on the first try and reuse the
    cached jit."""
    n_dev = mesh.devices.size
    nper = int(np.asarray(orders_key).shape[0]) // n_dev
    build_per = int(np.asarray(dim_key).shape[0]) // n_dev
    sf, of = shuffle_factor, out_factor
    last: Optional[PipelineOverflowError] = None
    for attempt in range(max_retries + 1):
        jitted = build_filter_join_agg_sort(
            mesh, nper, build_per, num_groups=num_groups,
            filter_threshold=filter_threshold, shuffle_factor=sf,
            out_factor=of, **kw)
        try:
            keys, sums, counts, metrics = run_pipeline(
                jitted, orders_key, orders_amt, dim_key, dim_seg, mesh)
            metrics["retries"] = attempt
            metrics["shuffle_factor"] = sf
            metrics["out_factor"] = of
            return keys, sums, counts, metrics
        except PipelineOverflowError as e:
            last = e
            sf, of = sf * 2, of * 2
    raise last


def measure_scaling_efficiency(device_counts, total_rows: int,
                               total_build: int, num_groups: int = 16,
                               seed: int = 0, repeats: int = 3, **kw):
    """configs[4] scaling-efficiency harness (BASELINE.md: target ≥75% at
    ≥2 hosts, measured at 1 chip / 1 host / N hosts).

    Strong scaling: the SAME total table (``total_rows`` orders ×
    ``total_build`` dim rows, fixed seed) runs over meshes of each size in
    ``device_counts``; per size the pipeline compiles once (memoized jit),
    then the best of ``repeats`` steady-state walls is recorded.
    efficiency(n) = T(1) / (n · T(n)) — 1.0 is perfect linear scaling.

    Returns a list of {"n_devices", "wall_s", "rows_per_s", "efficiency"}.
    On the virtual CPU mesh this validates the harness + accounting (the
    collectives are loopback); physical efficiency numbers require a real
    multi-chip slice.
    """
    import time

    counts = sorted(set(int(n) for n in device_counts))
    max_n = counts[-1]
    assert total_rows % max_n == 0 and total_build % max_n == 0, \
        "total work must divide every mesh size"
    rng = np.random.default_rng(seed)
    orders_key = (rng.zipf(1.4, total_rows) % (total_build * 2)) \
        .astype(np.int64)
    orders_amt = rng.integers(1, 100, total_rows).astype(np.int64)
    dim_key = rng.permutation(total_build * 2)[:total_build] \
        .astype(np.int64)
    dim_seg = rng.integers(0, num_groups, total_build).astype(np.int64)

    results = []
    wall_1 = None
    for n in counts:
        devices = jax.devices()[:n]
        if len(devices) < n:
            break
        mesh = jax.make_mesh((n,), (AXIS,), devices=devices)
        jitted = build_filter_join_agg_sort(
            mesh, total_rows // n, total_build // n,
            num_groups=num_groups, **kw)
        # compile + warm once, then take the best steady-state wall
        run_pipeline(jitted, orders_key, orders_amt, dim_key, dim_seg, mesh)
        best = None
        for _ in range(repeats):
            _, _, _, metrics = run_pipeline(
                jitted, orders_key, orders_amt, dim_key, dim_seg, mesh)
            w = metrics["wall_time_s"]
            best = w if best is None else min(best, w)
        if wall_1 is None:
            wall_1 = best * counts[0]  # normalize if counts[0] != 1
        eff = wall_1 / (n * best)
        results.append({"n_devices": n, "wall_s": best,
                        "rows_per_s": total_rows / best,
                        "efficiency": eff})
    return results


def measure_weak_scaling(device_counts, rows_per_shard: int,
                         build_per_shard: int, num_groups: int = 16,
                         seed: int = 0, repeats: int = 3, **kw):
    """Weak-scaling harness (r5 — VERDICT r4 weak #5): per-shard work is
    FIXED, so a perfectly scaling system keeps walls flat as devices are
    added (efficiency(n) = T(1)/T(n)).

    On the virtual CPU mesh, walls can only stay flat while n ≤ the host's
    physical core count — beyond that the virtual devices time-share cores
    and T(n) grows ∝ n/cores by construction. The table is still the right
    harness shape for a real pod, and on the virtual mesh it validates that
    per-shard work (not total work) is what each device executes.

    Returns a list of {"n_devices", "wall_s", "rows_per_s", "efficiency"}.
    """
    counts = sorted(set(int(n) for n in device_counts))
    rng = np.random.default_rng(seed)
    results = []
    wall_1 = None
    for n in counts:
        devices = jax.devices()[:n]
        if len(devices) < n:
            break
        total, tb = rows_per_shard * n, build_per_shard * n
        orders_key = (rng.zipf(1.4, total) % (tb * 2)).astype(np.int64)
        orders_amt = rng.integers(1, 100, total).astype(np.int64)
        dim_key = rng.permutation(tb * 2)[:tb].astype(np.int64)
        dim_seg = rng.integers(0, num_groups, tb).astype(np.int64)
        mesh = jax.make_mesh((n,), (AXIS,), devices=devices)
        jitted = build_filter_join_agg_sort(
            mesh, rows_per_shard, build_per_shard,
            num_groups=num_groups, **kw)
        run_pipeline(jitted, orders_key, orders_amt, dim_key, dim_seg, mesh)
        best = None
        for _ in range(repeats):
            _, _, _, metrics = run_pipeline(
                jitted, orders_key, orders_amt, dim_key, dim_seg, mesh)
            w = metrics["wall_time_s"]
            best = w if best is None else min(best, w)
        if wall_1 is None:
            wall_1 = best
        results.append({"n_devices": n, "wall_s": best,
                        "rows_per_s": total / best,
                        "efficiency": wall_1 / best})
    return results


def model_ici_efficiency(metrics: Dict, n_devices: int,
                         ici_bytes_per_s: float = 9e10,
                         hbm_bytes_per_s: float = 8.19e11):
    """Project real-pod scaling efficiency from MEASURED per-shard byte
    counts (r5 — VERDICT r4 missing #3: the virtual mesh cannot time ICI,
    but the pipeline already counts what would cross it).

    Model: per shard and per step,
      t_compute ≈ essential HBM bytes / HBM bandwidth — 16 B/row through
        each operator pass (key + value lanes), i.e.
        16·(rows_in + filter_out + 2·join_out) / n;
      t_comm    ≈ bytes_shuffled/n · (P-1)/P / ICI bandwidth — an
        all_to_all keeps 1/P of the bytes on-chip.
    XLA overlaps the exchange with local compute inside the single fused
    program (the pipeline runs in ONE shard_map jit), so the projected
    efficiency is t_compute / max(t_compute, t_comm); the serialized bound
    t_compute / (t_compute + t_comm) is reported alongside as the floor.

    Defaults: v5e HBM ≈ 819 GB/s; ICI ≈ 90 GB/s effective per-chip
    all_to_all bandwidth (conservative fraction of the ~400 GB/s aggregate
    link bandwidth, accounting for bidirectional traffic and protocol
    overhead). Both are stated constants, not measurements.
    """
    n = max(1, n_devices)
    hbm_bytes = 16.0 * (metrics["rows_in"] + metrics["filter_out"]
                        + 2 * metrics["join_out"]) / n
    comm_bytes = metrics["bytes_shuffled"] / n * (n - 1) / n
    t_comp = hbm_bytes / hbm_bytes_per_s
    t_comm = comm_bytes / ici_bytes_per_s
    # two compute models: the HBM-essential roofline (aspirational — if
    # operators reached it, a pipeline shuffling ~40% of its bytes becomes
    # ICI-bound and the exchange itself needs optimizing) and the MEASURED
    # single-chip operator speed (BENCH_r05-class ops run well above the
    # roofline's ns/row, so today comm hides entirely under compute)
    measured_ns_per_row = 2.0   # ~500 Mrows/s pipeline-blend, conservative
    t_comp_meas = metrics["rows_in"] / n * measured_ns_per_row * 1e-9
    return {
        "hbm_bytes_per_shard": hbm_bytes,
        "ici_bytes_per_shard": comm_bytes,
        "t_compute_s": t_comp,
        "t_comm_s": t_comm,
        "t_compute_measured_s": t_comp_meas,
        "efficiency_overlapped": t_comp / max(t_comp, t_comm)
        if max(t_comp, t_comm) > 0 else 1.0,
        "efficiency_serialized": t_comp / (t_comp + t_comm)
        if (t_comp + t_comm) > 0 else 1.0,
        "efficiency_measured": t_comp_meas / max(t_comp_meas, t_comm)
        if max(t_comp_meas, t_comm) > 0 else 1.0,
    }
