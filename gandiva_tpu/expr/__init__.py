from .nodes import (BooleanNode, Condition, Expression, FieldNode,
                    FunctionNode, IfNode, InNode, LiteralNode, Node)
from .builder import TreeExprBuilder
