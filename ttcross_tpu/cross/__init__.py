from .engine import CrossResult, cross, make_engine
from .state import CrossState, empty_state

__all__ = ["CrossResult", "cross", "make_engine", "CrossState", "empty_state"]
