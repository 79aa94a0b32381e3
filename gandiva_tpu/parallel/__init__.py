"""Distribution layer: 1-axis partition mesh, all_to_all shuffle, skew-aware
distributed operators, and pipeline composition (SURVEY.md §2c, §5.8)."""
from . import mesh, ops, pipeline, shuffle
from .mesh import PARTITION_AXIS, make_mesh
