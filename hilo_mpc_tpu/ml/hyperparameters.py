"""Hyperparameters with positivity transforms, bounds, fixed flags, and priors.

Rebuild of the reference's Parameter/PositiveParameter/Hyperparameter machinery
(reference: hilo_mpc/util/machine_learning.py:121-519): positive parameters are
optimized in log-space, `fixed` excludes a parameter from fitting, bounds clip the
search space, and an optional prior contributes its log-pdf to the fit objective.
"""
from __future__ import annotations


import numpy as np


class Hyperparameter:
    # monotonically increasing serial so every instance gets a unique params-dict
    # key: two kernels/means of the same family in one composite (e.g. SE(...) +
    # SE(...)) must NOT alias each other's entries. `name` stays the
    # human-readable reference-style identifier ("SE.length_scales"); `key` is
    # what eval()/param dicts use internally.
    _serial = 0

    def __init__(self, name: str, value=1.0, positive: bool = True,
                 fixed: bool = False, bounds=None, prior=None):
        self.name = name
        Hyperparameter._serial += 1
        self.key = f"{name}#{Hyperparameter._serial}"
        self.positive = bool(positive)
        self.fixed = bool(fixed)
        if prior is not None and not hasattr(prior, "log_pdf"):
            # reference parity: hyperpriors must be Prior distributions
            # (util/machine_learning.py rejects non-Prior hyperprior values)
            raise TypeError(
                f"{name}: prior must be a Prior distribution with a log_pdf "
                f"(got {type(prior).__name__})")
        self.prior = prior
        self._value = np.atleast_1d(np.asarray(value, dtype=float))
        if self.positive and np.any(self._value <= 0):
            raise ValueError(f"{name}: positive hyperparameter must be > 0")
        if bounds == "fixed":
            self.fixed = True
            bounds = None
        self.bounds = bounds

    @property
    def value(self) -> np.ndarray:
        return self._value

    @value.setter
    def value(self, v):
        v = np.atleast_1d(np.asarray(v, dtype=float))
        if self.positive and np.any(v <= 0):
            raise ValueError(f"{self.name}: must be > 0")
        self._value = v

    @property
    def size(self) -> int:
        return self._value.size

    # -- transform to/from the unconstrained fitting space -------------------
    def to_unconstrained(self) -> np.ndarray:
        return np.log(self._value) if self.positive else np.array(self._value)

    def from_unconstrained(self, w):
        return np.exp(w) if self.positive else np.asarray(w)

    def log_prior(self, value):
        if self.prior is None:
            return 0.0
        return self.prior.log_pdf(value)

    def __repr__(self):
        return (f"Hyperparameter({self.name!r}, value={self._value}, "
                f"positive={self.positive}, fixed={self.fixed})")
