"""Configuration — compile-time flags.

Mirrors gandiva::Configuration / ConfigurationBuilder (libgandiva.pxd:279-298;
python surface gandiva.pyx:591-626): ``optimize`` (default True) and
``dump_ir`` (default False), as a small frozen object threaded through the
compile entry points — never global mutable state (SURVEY.md §5.6).

TPU mapping: in the reference ``optimize=False`` skips the LLVM optimization
pass pipeline — codegen still correct, just unoptimized. Here ``optimize=True``
(default) compiles the plan with ``jax.jit`` and enables the persistent XLA
compilation cache; ``optimize=False`` evaluates the traced program eagerly
(op-by-op, no XLA fusion pipeline, no persistent cache) — the same semantic
split: identical results, optimization pipeline off. ``dump_ir`` retains the
lowered StableHLO/HLO text on the compiled object (the DumpIR analogue,
exposed as ``.hlo`` mirroring pyarrow's ``.llvm_ir``).
"""
from __future__ import annotations

import dataclasses
import os

_CACHE_ENABLED = False


def enable_persistent_cache() -> None:
    """Process-wide persistent XLA compilation cache (SURVEY.md §5.4: the
    LLVM-module cache analogue). Idempotent; called at Make time for any
    plan whose Configuration has ``optimize=True``."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    # never clobber a cache the user already configured (jax config or env)
    if (jax.config.jax_compilation_cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
        _CACHE_ENABLED = True
        return
    cache_dir = os.environ.get(
        "GANDIVA_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gandiva_tpu",
                     "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        # read-only install or unwritable HOME: degrade to no persistent
        # cache rather than failing every Make
        _CACHE_ENABLED = True
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _CACHE_ENABLED = True


@dataclasses.dataclass(frozen=True)
class Configuration:
    """``raise_errors`` (engine extension, default False): surface runtime
    evaluation errors — integer/decimal divide-by-zero, castDECIMAL
    overflow — as Python exceptions at the Evaluate boundary, matching the
    reference's Status-from-Evaluate contract (gandiva raises e.g. "divide
    by zero error" from Projector::Evaluate). A TPU kernel cannot raise, so
    the compiled plan reduces per-row error predicates to one device error
    code returned alongside the outputs; the host checks it per batch
    (one extra scalar sync per Evaluate — the price of Status parity, which
    is why the flag is opt-in; off, integer x/0 yields 0, documented in
    registry/numeric.py)."""
    optimize: bool = True
    dump_ir: bool = False
    raise_errors: bool = False


class ConfigurationBuilder:
    """Builder mirroring the reference API shape."""

    _default = Configuration()

    def __init__(self):
        self._optimize = True
        self._dump_ir = False
        self._raise_errors = False

    def with_optimize(self, v: bool) -> "ConfigurationBuilder":
        self._optimize = bool(v)
        return self

    def with_dump_ir(self, v: bool) -> "ConfigurationBuilder":
        self._dump_ir = bool(v)
        return self

    def with_raise_errors(self, v: bool) -> "ConfigurationBuilder":
        self._raise_errors = bool(v)
        return self

    def build(self) -> Configuration:
        return Configuration(self._optimize, self._dump_ir,
                             self._raise_errors)

    @classmethod
    def default_configuration(cls) -> Configuration:
        return cls._default
