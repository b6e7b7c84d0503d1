from .iterative import (
    IterativeSparseSolver,
    CGIterativeSparseSolver,
    FGMRESIterativeSparseSolver,
    ConvergenceWarning,
    cg,
    fgmres,
)
from .pardiso import pardiso, pardisoinit
from .qr import sparse_qr_solver

__all__ = [
    "IterativeSparseSolver",
    "CGIterativeSparseSolver",
    "FGMRESIterativeSparseSolver",
    "ConvergenceWarning",
    "cg",
    "fgmres",
    "pardiso",
    "pardisoinit",
    "sparse_qr_solver",
]
