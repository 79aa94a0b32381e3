"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must be fast and hermetic; the real TPU (reached through a tunnel in
this environment) is reserved for bench.py. Multi-chip sharding tests run on
the 8-device virtual CPU mesh (SURVEY.md §4.3). The axon sitecustomize pins
JAX_PLATFORMS=axon, so the platform must be overridden programmatically
before the first jax operation.
"""
import os
import sys

# ensure the repo root is importable regardless of pytest rootdir config
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
