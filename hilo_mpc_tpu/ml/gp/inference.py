"""GP inference methods (reference: hilo_mpc/modules/machine_learning/gp/
inference.py:44-257 — exact inference implemented, approximate methods declared).

Exact posterior (Rasmussen & Williams alg. 2.1) as pure JAX: Cholesky of
K + sigma_n^2 I, alpha-solve, posterior mean/variance and log marginal likelihood.
Everything is traceable, so a fitted GP embeds straight into MPC/model graphs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Inference:
    pass


class ExactInference(Inference):
    @staticmethod
    def posterior_state(kernel, mean, params, X, y, noise_variance, jitter=None):
        """Precompute (L, alpha) for training data X (n, d), y (n,).

        A dtype-aware jitter floor (relative to the gram diagonal) keeps the
        Cholesky factorizable when noise_variance is below the float's
        resolution — e.g. sigma_n=1e-4 means variance 1e-8, invisible next to
        O(1) gram entries in f32. Without it the posterior is silently NaN.
        """
        n = X.shape[0]
        K = kernel.gram(params, X)
        if jitter is None:
            jitter = 1e-6 if K.dtype == jnp.float32 else 1e-12
        floor = jitter * jnp.mean(jnp.diagonal(K))
        K = K + (noise_variance + floor) * jnp.eye(n, dtype=K.dtype)
        L = jnp.linalg.cholesky(K)
        m = jax.vmap(lambda a: mean.eval(params, a))(X)
        resid = y - m
        alpha = jax.scipy.linalg.cho_solve((L, True), resid)
        return L, alpha, resid

    @staticmethod
    def log_marginal_likelihood(kernel, mean, params, X, y, noise_variance):
        n = X.shape[0]
        L, alpha, resid = ExactInference.posterior_state(
            kernel, mean, params, X, y, noise_variance)
        return (-0.5 * jnp.dot(resid, alpha)
                - jnp.sum(jnp.log(jnp.diagonal(L)))
                - 0.5 * n * jnp.log(2 * jnp.pi))

    @staticmethod
    def predict(kernel, mean, params, X, L, alpha, x_star, noise_variance,
                include_noise=False):
        """Posterior mean and variance at a single query point x_star (d,)."""
        k_star = jax.vmap(lambda a: kernel.eval(params, a, x_star))(X)
        mu = mean.eval(params, x_star) + jnp.dot(k_star, alpha)
        v = jax.scipy.linalg.solve_triangular(L, k_star, lower=True)
        var = kernel.eval(params, x_star, x_star) - jnp.dot(v, v)
        var = jnp.maximum(var, 1e-12)
        if include_noise:
            var = var + noise_variance
        return mu, var


def _unsupported(name):
    class _Stub(Inference):
        def __init__(self, *a, **kw):
            raise NotImplementedError(
                f"{name} inference is not implemented (the reference declares the "
                f"same stub, gp/inference.py:44-257); use exact inference")

    _Stub.__name__ = name
    return _Stub


Laplace = _unsupported("Laplace")
ExpectationPropagation = _unsupported("ExpectationPropagation")
VariationalBayes = _unsupported("VariationalBayes")
KullbackLeibler = _unsupported("KullbackLeibler")
