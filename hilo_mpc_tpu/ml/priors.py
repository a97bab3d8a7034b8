"""Hyperparameter priors (reference: hilo_mpc/util/probability.py:36-346):
Gaussian/Laplace/Student's-t/Delta log-pdfs contributed to the GP fit objective."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class Prior:
    def log_pdf(self, value):
        raise NotImplementedError


class GaussianPrior(Prior):
    def __init__(self, mean: float = 0.0, variance: float = 1.0):
        if variance <= 0:
            raise ValueError("variance must be > 0")
        self.mean = float(mean)
        self.variance = float(variance)

    def log_pdf(self, value):
        d = value - self.mean
        return jnp.sum(-0.5 * d * d / self.variance
                       - 0.5 * jnp.log(2 * jnp.pi * self.variance))


class LaplacePrior(Prior):
    def __init__(self, mean: float = 0.0, scale: float = 1.0):
        if scale <= 0:
            raise ValueError("scale must be > 0")
        self.mean = float(mean)
        self.scale = float(scale)

    def log_pdf(self, value):
        return jnp.sum(-jnp.abs(value - self.mean) / self.scale
                       - jnp.log(2 * self.scale))


class StudentsTPrior(Prior):
    def __init__(self, mean: float = 0.0, scale: float = 1.0, nu: float = 3.0):
        if scale <= 0 or nu <= 0:
            raise ValueError("scale and nu must be > 0")
        self.mean = float(mean)
        self.scale = float(scale)
        self.nu = float(nu)

    def log_pdf(self, value):
        from jax.scipy.special import gammaln

        z = (value - self.mean) / self.scale
        nu = self.nu
        const = (gammaln((nu + 1) / 2) - gammaln(nu / 2)
                 - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(self.scale))
        return jnp.sum(const - (nu + 1) / 2 * jnp.log1p(z * z / nu))


class DeltaPrior(Prior):
    """Fixes the parameter at a point (infinite density; excluded from fitting)."""

    def __init__(self, value: float = 0.0):
        self.value = float(value)

    def log_pdf(self, value):
        return jnp.zeros(())
