"""Worker for the multi-process mesh smoke test (SURVEY.md §4.3).

Runs the canonical filter→join→agg→sort pipeline either single-process
(2 virtual CPU devices) or as one of two jax.distributed processes
(2 virtual devices each → 4-device global mesh over gloo). Same seeded
inputs both ways; process 0 writes the sorted group results to a JSON file
so the pytest harness can compare runs row-for-row.

Usage: python mp_pipeline_worker.py <single|dist> <process_id> <port> <out>
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

mode, pid, port, out_path = (sys.argv[1], int(sys.argv[2]), sys.argv[3],
                             sys.argv[4])

if mode == "dist":
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gandiva_tpu.parallel import mesh as meshmod
from gandiva_tpu.parallel.pipeline import build_filter_join_agg_sort

devices = jax.devices()
n_dev = len(devices)
mesh = jax.make_mesh((n_dev,), (meshmod.PARTITION_AXIS,), devices=devices)

TOTAL, BTOTAL = 1024, 128
rng = np.random.default_rng(0)
orders_key = (rng.zipf(1.4, TOTAL) % (BTOTAL * 2)).astype(np.int64)
orders_amt = rng.integers(1, 100, TOTAL).astype(np.int64)
dim_key = rng.permutation(BTOTAL * 2)[:BTOTAL].astype(np.int64)
dim_seg = rng.integers(0, 5, BTOTAL).astype(np.int64)

sh = NamedSharding(mesh, P(meshmod.PARTITION_AXIS))


def shard(arr):
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx, _a=arr: _a[idx])


jitted = build_filter_join_agg_sort(mesh, TOTAL // n_dev, BTOTAL // n_dev,
                                    num_groups=16, num_hot=8,
                                    hot_capacity=64)
skeys, ssum, scount, n_groups, overflow, metrics = jitted(
    shard(orders_key), shard(orders_amt), shard(dim_key), shard(dim_seg))


def fetch(x):
    try:
        return np.asarray(x)
    except Exception:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))


ng = int(fetch(n_groups)[0])
assert not bool(fetch(overflow).any()), "pipeline overflow in smoke test"
result = {
    "keys": fetch(skeys)[:ng].tolist(),
    "sums": fetch(ssum)[:ng].tolist(),
    "counts": fetch(scount)[:ng].tolist(),
    "rows_in": int(fetch(metrics["rows_in"]).sum()),
}
if pid == 0:
    with open(out_path, "w") as f:
        json.dump(result, f)
print(f"worker {mode}/{pid}: ok ({ng} groups)", flush=True)
