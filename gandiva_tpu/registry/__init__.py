from .registry import (ExpressionValidationError, FunctionRegistry,
                       NativeFunction, Nullability, Val, global_registry)
from .signature import FunctionSignature
