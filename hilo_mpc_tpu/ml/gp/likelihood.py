"""GP observation likelihoods.

The reference declares Gaussian, Logistic, Laplacian and Student's-t
likelihoods but implements only Gaussian (reference: hilo_mpc/modules/
machine_learning/gp/likelihood.py:24-102 — the others raise
NotImplementedError). Here Gaussian, Logistic and Student's-t are REAL:
each provides a traceable elementwise ``log_pdf(f, y, sn2)`` (log p(y|f)
given the latent function value f and the squared noise scale sn2), which
is all that exact inference (Gaussian) and the Laplace approximation
(ml/gp/inference.py — mode finding differentiates log_pdf with jax.grad)
need. Laplacian observation noise is kept as a declared stub like the
reference: its log-density is piecewise linear, so the Laplace
approximation's Newton step has zero curvature almost everywhere and the
method is not applicable (the standard treatment is EP).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Likelihood:
    """Base: elementwise log p(y | f). ``sn2`` is the squared noise scale
    (the GP's ``noise_variance`` hyperparameter squared); likelihoods
    without a noise parameter ignore it."""

    name = "likelihood"
    #: True when log p(y|f) is concave in f for fixed y (Newton mode finding
    #: needs no curvature clipping)
    log_concave = True
    #: True when this likelihood uses the GP noise_variance hyperparameter
    uses_noise = True

    def log_pdf(self, f, y, sn2):
        raise NotImplementedError


class Gaussian(Likelihood):
    """Gaussian observation noise — closed-form with exact inference; under
    the Laplace approximation the posterior is exactly Gaussian, so Newton
    converges in one step and results match exact inference (pinned by
    tests/test_gp_laplace.py)."""

    name = "gaussian"

    def log_pdf(self, f, y, sn2):
        r = y - f
        return -0.5 * (r * r / sn2 + jnp.log(2 * jnp.pi * sn2))


class Logistic(Likelihood):
    """Logistic (Bernoulli) likelihood for binary classification,
    p(y=+1|f) = sigma(f) with labels y in {-1, +1}. log-concave, so the
    Laplace mode-finding Newton iteration is globally convergent (GPML
    section 3.4). Has no noise parameter — the GP fixes noise_variance."""

    name = "logistic"
    uses_noise = False

    def log_pdf(self, f, y, sn2):
        # log sigma(y f), numerically stable for large |f|
        return jax.nn.log_sigmoid(y * f)


class Probit(Likelihood):
    """Probit (cumulative-Gaussian) likelihood for binary classification,
    p(y=+1|f) = Phi(f) with labels y in {-1, +1}. log-concave (works under
    Laplace too), and the one likelihood whose Expectation-Propagation
    moment integrals are closed-form (GPML section 3.6) — the EP inference
    (ml/gp/inference.py) requires it. No noise parameter."""

    name = "probit"
    uses_noise = False

    def log_pdf(self, f, y, sn2):
        return jax.scipy.stats.norm.logcdf(y * f)


class StudentsT(Likelihood):
    """Student's-t observation noise for outlier-robust regression:
    p(y|f) = t_nu((y - f)/sigma)/sigma with scale sigma = sqrt(sn2) and
    ``df`` degrees of freedom (fixed, not fitted). NOT log-concave — the
    Laplace approximation clips negative curvature at a small floor
    (standard practice; GPML section 3.4 discusses the limitation)."""

    name = "students_t"
    log_concave = False

    def __init__(self, df: float = 4.0):
        if df <= 1.0:
            raise ValueError("Student's-t degrees of freedom must be > 1")
        self.df = float(df)

    def log_pdf(self, f, y, sn2):
        nu = self.df
        r2 = (y - f) ** 2
        return (jax.scipy.special.gammaln((nu + 1.0) / 2.0)
                - jax.scipy.special.gammaln(nu / 2.0)
                - 0.5 * jnp.log(nu * jnp.pi * sn2)
                - 0.5 * (nu + 1.0) * jnp.log1p(r2 / (nu * sn2)))


def _unsupported(name, why):
    class _Stub(Likelihood):
        def __init__(self, *a, **kw):
            raise NotImplementedError(
                f"{name} likelihood is not implemented ({why})")

    _Stub.__name__ = name
    return _Stub


Laplacian = _unsupported(
    "Laplacian",
    "piecewise-linear log-density: zero curvature defeats the Laplace "
    "approximation; the reference declares the same stub, "
    "gp/likelihood.py:87-93")
