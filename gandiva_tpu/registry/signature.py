"""FunctionSignature — (base name, param types, return type).

Mirrors gandiva/function_signature.h (declared libgandiva.pxd:258-272; python
wrapper gandiva.pyx:709-745). Hashable so it can key registry tables and be
compared in tests.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

from .. import dtypes as dt


@dataclasses.dataclass(frozen=True)
class FunctionSignature:
    name: str
    param_types: Tuple[dt.DataType, ...]
    return_type: dt.DataType

    def __str__(self) -> str:
        params = ", ".join(str(t) for t in self.param_types)
        return f"{self.return_type} {self.name}({params})"

    __repr__ = __str__
