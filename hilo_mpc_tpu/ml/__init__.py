from .nn import ArtificialNeuralNetwork, Dense, Dropout, Layer
from .hybrid import hybridize, substitute_from
from .priors import DeltaPrior, GaussianPrior, LaplacePrior, StudentsTPrior
