from .engine import cross_parallel, make_parallel_engine
from .engine_dd import cross_dd_parallel
from .engine_qd import cross_qd_parallel
from .maxvol import maxvol_refine_parallel
from .mesh import BOND_AXIS, bond_mesh, share
from .quad import pcontract

__all__ = ["cross_parallel", "make_parallel_engine", "cross_dd_parallel",
           "cross_mp_parallel", "cross_qd_parallel",
           "maxvol_refine_parallel", "BOND_AXIS", "bond_mesh", "share",
           "pcontract"]

_LAZY = {"cross_mp_parallel": "engine_mp"}  # mp tier: optional mpmath dep


def __getattr__(name):
    # parallel/engine_mp.py imports mpmath at module scope; keep the base
    # jax+numpy install importable by resolving the mp tier on first use.
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        val = getattr(mod, name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
