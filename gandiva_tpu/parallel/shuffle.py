"""Distributed shuffle — all-to-all repartition along the partition axis.

The reference's deployment (Dremio) does exchanges in its Java RPC layer,
outside the repo (SURVEY.md §2c, §5.8); this module is the TPU-native design:
inside ``shard_map`` each device buckets its rows by destination partition
into fixed-capacity send buffers (static shapes — the SelectionVector idea
generalized to 2-D), then one ``lax.all_to_all`` moves the buffers over
ICI/DCN. Variable row counts ride alongside as a per-partition count vector;
capacity overflow is detected and surfaced as a per-shard flag
(Status-style error at the host boundary, SURVEY.md §5.3).

Layout contract: every per-shard table is ``(values[N], valid[N])`` columns;
after exchange, rows from source shard s live in block s of the [P, cap]
receive buffer with ``recv_counts[s]`` valid rows.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.hashing import partition_of


def bucket_by_partition(part_ids, valid, payload: Dict[str, Any],
                        num_partitions: int, capacity: int):
    """Pack rows into [P, capacity] send buffers grouped by partition id.

    Returns (send_payload: {name: [P, cap]}, counts: [P] int32,
    overflow: bool scalar). Rows with ``valid=False`` are dropped. Stable
    within each partition (rows keep their relative order).
    """
    n = part_ids.shape[0]
    P = num_partitions
    # invalid rows sort to bucket P (dropped)
    part = jnp.where(valid, part_ids, P).astype(jnp.int32)
    order = jnp.argsort(part, stable=True)
    sorted_part = part[order]

    counts = jnp.zeros((P + 1,), jnp.int32).at[part].add(1)[:P]
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts, dtype=jnp.int32)[:-1]])
    # rank of each sorted row within its partition
    slot = jnp.arange(n, dtype=jnp.int32) - offsets[jnp.clip(sorted_part, 0, P - 1)]
    ok = (sorted_part < P) & (slot < capacity)
    flat_idx = jnp.where(ok, sorted_part * capacity + slot, P * capacity)

    send = {}
    for name, col in payload.items():
        g = jnp.asarray(col)[order]
        buf = jnp.zeros((P * capacity + 1,), dtype=g.dtype)
        buf = buf.at[flat_idx].set(g, mode="drop")
        send[name] = buf[:P * capacity].reshape(P, capacity)
    overflow = jnp.any(counts > capacity)
    return send, jnp.minimum(counts, capacity), overflow


def exchange(part_ids, valid, payload: Dict[str, Any], axis: str,
             capacity: int):
    """Bucket + all_to_all. Call inside shard_map over a 1-axis mesh.

    Returns (recv_payload: {name: [P, cap]}, recv_counts: [P], overflow).
    recv row block p came from source shard p.
    """
    P = lax.axis_size(axis)
    send, counts, overflow = bucket_by_partition(part_ids, valid, payload,
                                                 P, capacity)
    recv = {name: lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                                 tiled=True)
            for name, buf in send.items()}
    recv_counts = lax.all_to_all(counts, axis, split_axis=0, concat_axis=0,
                                 tiled=True)
    overflow = lax.pmax(overflow.astype(jnp.int32), axis) > 0
    return recv, recv_counts, overflow


def flatten_received(recv: Dict[str, Any], recv_counts):
    """[P, cap] receive buffers → flat [P*cap] columns + validity mask."""
    P, cap = next(iter(recv.values())).shape[:2]
    within = jax.lax.broadcasted_iota(jnp.int32, (P, cap), 1)
    valid = (within < recv_counts[:, None]).reshape(P * cap)
    flat = {name: buf.reshape(P * cap, *buf.shape[2:])
            for name, buf in recv.items()}
    return flat, valid


def shuffle_by_key(keys, valid, payload: Dict[str, Any], axis: str,
                   capacity: int, seed=0):
    """Hash-partition rows by key and exchange: the engine's repartition
    primitive (north_star: 'tables hash-partitioned across hosts').

    Returns (flat payload [P*cap], flat validity, overflow flag).
    """
    P = lax.axis_size(axis)
    part = partition_of(keys, P, jnp.uint32(seed))
    recv, recv_counts, overflow = exchange(part, valid, payload, axis,
                                           capacity)
    flat, flat_valid = flatten_received(recv, recv_counts)
    return flat, flat_valid, overflow
