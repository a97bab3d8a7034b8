from .ip_solver import (IPOptions, OCPBounds, OCPDims, OCPFunctions, OCPSolution,
                        default_bounds, solve_ocp, solve_ocp_batched)
from .riccati import LQSolution, dare_solve, lqr_backward, solve_lq

__all__ = [
    "IPOptions", "OCPBounds", "OCPDims", "OCPFunctions", "OCPSolution",
    "default_bounds", "solve_ocp", "solve_ocp_batched", "LQSolution",
    "dare_solve", "lqr_backward", "solve_lq",
]
