from .engine import cross_parallel, make_parallel_engine
from .mesh import BOND_AXIS, bond_mesh, share

__all__ = ["cross_parallel", "make_parallel_engine", "BOND_AXIS", "bond_mesh", "share"]
