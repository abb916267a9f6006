from .types import TT, from_cores, ones, rank1, zeros
from .ops import (
    add,
    contract,
    dot,
    full,
    gather,
    group,
    hadamard,
    norm,
    scale,
    sumall,
    value,
)
from .ortho import chop_rank, from_dense, orthogonalize, svd_round

__all__ = [
    "TT", "from_cores", "ones", "rank1", "zeros",
    "add", "contract", "dot", "full", "gather", "group", "hadamard",
    "norm", "scale", "sumall", "value",
    "chop_rank", "from_dense", "orthogonalize", "svd_round",
]
