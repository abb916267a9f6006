from .accchk import accchk
from .batch import BatchCrossResult, cross_batch
from .defect import cross_defect_corrected, cross_defect_corrected_qd
from .engine import CrossResult, cross, make_engine
from .engine_dd import cross_dd
from .engine_mp import cross_mp
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
           "cross_defect_corrected", "cross_defect_corrected_qd", "refine_dd"]
