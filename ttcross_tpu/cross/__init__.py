from .accchk import accchk
from .batch import BatchCrossResult, cross_batch
from .defect import cross_defect_corrected, cross_defect_corrected_qd
from .engine import CrossResult, cross, make_engine
from .engine_dd import cross_dd
from .engine_mp_native import cross_mp_native, ising_cross_mp_native
from .engine_qd import cross_qd
from .maxvol import cross_maxvol, maxvol_refine
from .refine import refine_dd
from .skeleton import (Skeleton, extract_skeleton, reevaluate_host,
                       skeleton_tt_fn, skeleton_value_fn)
from .state import CrossState, empty_state

__all__ = ["CrossResult", "cross", "make_engine", "CrossState", "empty_state",
           "cross_maxvol", "maxvol_refine", "cross_batch", "BatchCrossResult",
           "Skeleton", "extract_skeleton", "skeleton_value_fn",
           "skeleton_tt_fn", "reevaluate_host", "accchk",
           "cross_dd", "cross_qd", "cross_mp",
           "cross_mp_native", "ising_cross_mp_native",
           "cross_defect_corrected", "cross_defect_corrected_qd", "refine_dd"]

_LAZY = {"cross_mp": "engine_mp"}  # 120-digit tier: needs optional mpmath


def __getattr__(name):
    # The mp tier (cross/engine_mp.py) imports mpmath at module scope;
    # mpmath is an optional extra (pyproject [project.optional-dependencies]),
    # so re-export it lazily to keep `import ttcross_tpu.cross` working on
    # the base jax+numpy install.
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        val = getattr(mod, name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
