"""Configuration — compile-time flags.

Mirrors gandiva::Configuration / ConfigurationBuilder (libgandiva.pxd:279-298;
python surface gandiva.pyx:591-626): ``optimize`` (default True) and
``dump_ir`` (default False), as a small frozen object threaded through the
compile entry points — never global mutable state (SURVEY.md §5.6).

TPU mapping: ``optimize`` toggles XLA autotuning-friendly donation and keeps
the persistent compilation cache on; ``dump_ir`` retains the lowered
StableHLO/HLO text on the compiled object (the DumpIR analogue, exposed as
``.hlo`` mirroring pyarrow's ``.llvm_ir``).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Configuration:
    optimize: bool = True
    dump_ir: bool = False


class ConfigurationBuilder:
    """Builder mirroring the reference API shape."""

    _default = Configuration()

    def __init__(self):
        self._optimize = True
        self._dump_ir = False

    def with_optimize(self, v: bool) -> "ConfigurationBuilder":
        self._optimize = bool(v)
        return self

    def with_dump_ir(self, v: bool) -> "ConfigurationBuilder":
        self._dump_ir = bool(v)
        return self

    def build(self) -> Configuration:
        return Configuration(self._optimize, self._dump_ir)

    @classmethod
    def default_configuration(cls) -> Configuration:
        return cls._default
