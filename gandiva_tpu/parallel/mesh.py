"""Device mesh management for the distributed engine.

The reference has no parallelism (SURVEY.md §2c): Gandiva is a single-thread
kernel library and Dremio's engine ran one fragment per thread over
hash-partitioned data. That deployment model — data parallelism over
partitions with all-to-all repartition between stages — is exactly what maps
to a 1-axis JAX device mesh: each device owns one partition of every table;
shuffles are `all_to_all` collectives riding ICI (DCN across hosts when
`jax.distributed.initialize()` widens the mesh).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTITION_AXIS = "p"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-axis partition mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (PARTITION_AXIS,),
                         devices=devices)


def partition_spec() -> P:
    return P(PARTITION_AXIS)


def sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(PARTITION_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
