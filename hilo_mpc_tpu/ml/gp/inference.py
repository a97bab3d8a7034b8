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
        with jax.default_matmul_precision("highest"):
            K = kernel.gram(params, X)
        if jitter is None:
            jitter = 1e-6 if K.dtype == jnp.float32 else 1e-12
        floor = jitter * jnp.mean(jnp.diagonal(K))
        K = K + (noise_variance + floor) * jnp.eye(n, dtype=K.dtype)
        with jax.default_matmul_precision("highest"):
            # TPU-default bf16 matmuls corrupt the factorization enough to
            # flip posterior variances negative — GP numerics always run full
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
        with jax.default_matmul_precision("highest"):
            k_star = jax.vmap(lambda a: kernel.eval(params, a, x_star))(X)
            mu = mean.eval(params, x_star) + jnp.dot(k_star, alpha)
            v = jax.scipy.linalg.solve_triangular(L, k_star, lower=True)
            k_ss = kernel.eval(params, x_star, x_star)
            var = k_ss - jnp.dot(v, v)
        # relative floor: below the float's resolution of k(x,x) a posterior
        # variance is numerically indistinguishable from zero anyway
        eps = 1e-6 if var.dtype == jnp.float32 else 1e-12
        var = jnp.maximum(var, eps * k_ss)
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
