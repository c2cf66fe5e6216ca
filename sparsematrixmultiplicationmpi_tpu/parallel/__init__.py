from .mesh import AXIS, initialize_distributed, make_mesh, make_mesh_2d
from .strategies import (
    STRATEGIES, Auto, ColumnWise, Library, NonZeroElement, RowWise,
    Sequential, Strategy, get_strategy,
)

__all__ = [
    "AXIS", "initialize_distributed", "make_mesh", "make_mesh_2d",
    "STRATEGIES", "Auto", "ColumnWise", "Library", "NonZeroElement",
    "RowWise", "Sequential", "Strategy", "get_strategy",
]
