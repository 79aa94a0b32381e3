"""gandiva_tpu — a TPU-native vectorized query-execution engine.

A from-scratch reimagination of the Gandiva expression compiler
(/root/reference — dremio/gandiva, continued as apache/arrow
cpp/src/gandiva) for TPU hardware: expression trees compile to fused XLA/
Pallas programs over columnar batches with validity-mask lanes, filters
produce static-shape selection vectors, and the engine extends the reference
surface with hash join, sort, hash aggregate, and a multi-host distributed
shuffle over JAX collectives (scope: BASELINE.json north_star).

Public API mirrors the reference's Python binding (pyarrow gandiva.pyx):
TreeExprBuilder, make_projector, make_filter, SelectionVector,
Configuration(Builder), get_registered_function_signatures.
"""
from __future__ import annotations

import jax as _jax

# The engine operates on 64-bit SQL types (int64/float64 are the workhorse
# Arrow column types); enable x64 before any array is created.
_jax.config.update("jax_enable_x64", True)

from . import dtypes  # noqa: E402
from .dtypes import DataType, Field, Schema  # noqa: E402
from .batch import Batch, Column, from_arrow, from_numpy, to_arrow  # noqa: E402
from .expr.nodes import (BooleanNode, Condition, Expression, FieldNode,  # noqa: E402
                         FunctionNode, IfNode, InNode, LiteralNode, Node)
from .expr.builder import TreeExprBuilder  # noqa: E402

# Register all kernel categories (import order defines registry population).
from .registry import numeric as _numeric  # noqa: E402,F401
from .registry import cast as _cast  # noqa: E402,F401
from .registry import datetime_ops as _datetime_ops  # noqa: E402,F401
from .registry import string_ops as _string_ops  # noqa: E402,F401
from .registry import hash_ops as _hash_ops  # noqa: E402,F401
from .registry import decimal_ops as _decimal_ops  # noqa: E402,F401
from .registry.registry import (EvaluationError,  # noqa: E402
                                ExpressionValidationError,
                                FunctionRegistry, global_registry)
from .registry.signature import FunctionSignature  # noqa: E402

from .compiler.config import Configuration, ConfigurationBuilder  # noqa: E402
from .compiler.selection import SelectionMode, SelectionVector  # noqa: E402
from .compiler.projector import (Filter, FilterProject, Projector,  # noqa: E402
                                 make_filter, make_filter_project,
                                 make_projector)
from . import native  # noqa: E402
from . import ops  # noqa: E402
from . import parallel  # noqa: E402
from .plan import (Plan, PlanError, dump_plan, load_plan,  # noqa: E402
                   make_filter_from_plan, make_projector_from_plan)


def get_registered_function_signatures():
    """All registered (name, param types, return type) signatures — the
    planner capability-negotiation surface (gandiva.pyx:748-764,
    libgandiva.pxd:274-277)."""
    return global_registry().all_signatures()


__all__ = [
    "dtypes", "DataType", "Field", "Schema",
    "Batch", "Column", "from_arrow", "from_numpy", "to_arrow",
    "Node", "LiteralNode", "FieldNode", "FunctionNode", "IfNode",
    "BooleanNode", "InNode", "Expression", "Condition",
    "TreeExprBuilder",
    "Configuration", "ConfigurationBuilder",
    "SelectionMode", "SelectionVector",
    "Projector", "Filter", "FilterProject", "make_projector",
    "make_filter", "make_filter_project",
    "FunctionRegistry", "FunctionSignature", "global_registry",
    "get_registered_function_signatures",
    "ExpressionValidationError", "EvaluationError",
    "Plan", "PlanError", "load_plan", "dump_plan",
    "make_projector_from_plan", "make_filter_from_plan",
    "ops", "parallel", "native",
]

__version__ = "0.1.0"
