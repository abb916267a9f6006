from .engine import cross_parallel, make_parallel_engine
from .engine_dd import cross_dd_parallel
from .engine_mp import cross_mp_parallel
from .engine_qd import cross_qd_parallel
from .maxvol import maxvol_refine_parallel
from .mesh import BOND_AXIS, bond_mesh, share
from .quad import pcontract

__all__ = ["cross_parallel", "make_parallel_engine", "cross_dd_parallel",
           "cross_mp_parallel", "cross_qd_parallel",
           "maxvol_refine_parallel", "BOND_AXIS", "bond_mesh", "share",
           "pcontract"]
