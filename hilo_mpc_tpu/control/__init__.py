from .nmpc import NMPC, OptimalControlProblem
from .costs import GenericConstraint, GenericCost, QuadraticCost
