"""Canonical engine entry points for harness/driver integration.

``flagship_step`` — the engine's flagship single-chip computation: the
BASELINE configs[0] query (filter ``a > 500``, project ``b*2 +
castFLOAT8(a)``) compiled through the real expression pipeline into one
jittable function.

``distributed_step`` — the full multi-chip execution step: per-shard filter →
hash-partition shuffle (all_to_all over the mesh) → per-shard grouped
aggregation → global combine. This is the shape of every distributed query
this engine runs (data-parallel over a 1-axis partition mesh; SURVEY.md §2c:
partition data-parallelism is the only parallelism axis with a referent in
the reference's deployment model).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from . import dtypes as dt
from .compiler.projector import Filter, Projector
from .expr.builder import TreeExprBuilder as B
from .parallel import mesh as meshmod
from .parallel.shuffle import shuffle_by_key


def _flagship_schema():
    return dt.Schema([dt.Field("a", dt.int64), dt.Field("b", dt.float64)])


def _flagship_plans():
    schema = _flagship_schema()
    na, nb = B.make_field(schema.field("a")), B.make_field(schema.field("b"))
    cond = B.make_condition(
        B.make_function("greater_than", [na, B.make_int64_literal(500)],
                        dt.bool_))
    expr = B.make_expression(
        B.make_function(
            "add",
            [B.make_function("multiply", [nb, B.make_double_literal(2.0)],
                             dt.float64),
             B.make_function("castFLOAT8", [na], dt.float64)],
            dt.float64),
        dt.Field("out", dt.float64))
    return Filter.make(schema, cond), Projector.make(schema, [expr])


def flagship_step():
    """Returns (fn, example_args): jittable fused filter+project step
    (dense projection + one sort-compaction — see FilterProject)."""
    from .compiler.projector import FilterProject

    filt, proj = _flagship_plans()
    fp = FilterProject.make(filt.schema, filt.condition, proj.exprs)

    def fn(a_data, a_valid, b_data, b_valid):
        cols = {"a": (a_data, a_valid), "b": (b_data, b_valid)}
        length = jnp.int32(a_data.shape[0])
        key = jax.random.PRNGKey(0)
        sel_idx, sel_count, packed = fp._run(cols, length, (), key)
        return sel_idx, sel_count, packed[0], packed[1]

    n = 8192
    rng = np.random.default_rng(0)
    example_args = (
        jnp.asarray(rng.integers(0, 1000, n).astype(np.int64)),
        jnp.ones(n, dtype=bool),
        jnp.asarray(rng.random(n)),
        jnp.ones(n, dtype=bool),
    )
    return fn, example_args


def flagship_stream():
    """Device-resident multi-batch flagship pipeline (BASELINE configs[0]
    at steady state): returns (jitted_fn, make_inputs) where jitted_fn runs
    a ``lax.scan`` over K stacked batches with zero host round-trips
    between batches and reduces every batch's outputs (selection indices +
    count + projected column + validity) to one int64 checksum scalar —
    all stages materialize on device, one scalar crosses the host link."""
    from .compiler.projector import FilterProject

    filt, proj = _flagship_plans()
    fp = FilterProject.make(filt.schema, filt.condition, proj.exprs)

    def consume(idx, count, packed):
        value, valid = packed[0], packed[1]   # rebuilt f64 column + validity
        return (count.astype(jnp.int64)
                + jnp.sum(idx.astype(jnp.int64))
                + jnp.sum(value).astype(jnp.int64)
                + jnp.sum(valid.astype(jnp.int64)))

    run = fp.stream_fn(consume)
    jfn = jax.jit(lambda cols: jnp.sum(run(cols)))

    def make_inputs(K: int, n: int, seed: int = 42,
                    null_frac: float = 0.05):
        """BASELINE configs[0] inputs: nullable int64 ``a`` (5% nulls —
        bench_reference/bench_arrow.py:15-17), non-null float64 ``b``."""
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.randint(k1, (K, n), 0, 1000, dtype=jnp.int64)
        b = jax.random.uniform(k2, (K, n), dtype=jnp.float64)
        a_valid = jax.random.uniform(k3, (K, n)) >= null_frac
        ones = jnp.ones((K, n), dtype=bool)
        return {"a": (a, a_valid), "b": (b, ones)}

    return jfn, make_inputs


def distributed_step(mesh, shuffle_capacity: int, num_groups: int = 64):
    """The full distributed query step, jitted over ``mesh``.

    Per shard: filter (expression engine) → shuffle by key hash → real
    ``hash_aggregate`` (GROUP BY key, sum+count) over received rows →
    psum row stats. Returns a jitted fn(keys, vals, valid) with inputs
    sharded over the partition axis; per-shard outputs are
    (group_keys, sums, counts, group_count) plus replicated
    (total_rows, overflow). Keys are co-located after the hash shuffle, so
    per-shard groups are globally disjoint — no cross-shard combine needed.
    """
    from .ops.hash_aggregate import hash_aggregate

    filt, proj = _flagship_plans()
    axis = meshmod.PARTITION_AXIS

    def shard_fn(keys, vals, valid):
        cols = {"a": (keys, valid), "b": (vals, valid)}
        length = jnp.int32(keys.shape[0])
        rkey = jax.random.PRNGKey(0)
        # 1. filter on the local shard
        sel_idx, sel_count = filt._run(cols, length, (), rkey)
        ((proj_val, proj_valid),) = proj._run_selected(
            cols, length, (), rkey, sel_idx, sel_count)
        row_ok = jnp.arange(keys.shape[0]) < sel_count
        sel_keys = keys[sel_idx]
        # 2. shuffle filtered rows by key hash
        flat, fvalid, overflow = shuffle_by_key(
            sel_keys, row_ok & proj_valid,
            {"key": sel_keys, "val": proj_val}, axis, shuffle_capacity)
        # 3. per-shard grouped aggregation via the real operator
        res = hash_aggregate(flat["key"],
                             [("val", "sum"), ("val", "count")],
                             {"val": (flat["val"], None)},
                             row_valid=fvalid, max_groups=num_groups,
                             group_null_keys=False)
        gkeys = res["keys"][:num_groups]
        gsum = res["agg:val:sum"][:num_groups]
        gcount = res["agg:val:count"][:num_groups]
        # 4. global row stats over the mesh
        total_rows = jax.lax.psum(jnp.sum(fvalid.astype(jnp.int64)), axis)
        agg_ovf = jax.lax.pmax(res["overflow"].astype(jnp.int32), axis) > 0
        # group_count is a rank-0 per-shard scalar; shard_map out_specs
        # over the partition axis need ≥1 axis to concatenate along
        return (gkeys, gsum, gcount, res["group_count"][None], total_rows,
                overflow | agg_ovf)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()))
    return jax.jit(fn)
