from .model import Model
from .series import TimeSeries
from .variables import VarSpec
from .integrators import (
    IntegratorSpec,
    ERK_METHODS,
    collocation_points,
    collocation_coefficients,
    make_step,
    newton_solve,
)

__all__ = [
    "Model", "TimeSeries", "VarSpec", "IntegratorSpec", "ERK_METHODS",
    "collocation_points", "collocation_coefficients", "make_step", "newton_solve",
]
