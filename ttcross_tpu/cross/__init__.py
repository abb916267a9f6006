from .batch import BatchCrossResult, cross_batch
from .engine import CrossResult, cross, make_engine
from .maxvol import cross_maxvol, maxvol_refine
from .skeleton import (Skeleton, extract_skeleton, reevaluate_host,
                       skeleton_tt_fn, skeleton_value_fn)
from .state import CrossState, empty_state

__all__ = ["CrossResult", "cross", "make_engine", "CrossState", "empty_state",
           "cross_maxvol", "maxvol_refine", "cross_batch", "BatchCrossResult",
           "Skeleton", "extract_skeleton", "skeleton_value_fn",
           "skeleton_tt_fn", "reevaluate_host"]
