from .kf import ExtendedKalmanFilter, KalmanFilter, UnscentedKalmanFilter
from .mhe import MovingHorizonEstimator
from .pf import ParticleFilter
