"""Kernel/mean value tables (reference style: tests/test_kernels.py — hand-computed
matrices for every kernel family, 248 tests) — parametrized over families, parameter
settings, and point pairs, plus differentiability checks for every kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu.ml.gp import (ConstantKernel, DotProductKernel,
                                ExponentialKernel, GammaExponentialKernel,
                                LinearKernel, Matern32Kernel, Matern52Kernel,
                                MaternKernel, NeuralNetworkKernel, PeriodicKernel,
                                PiecewisePolynomialKernel, PolynomialKernel,
                                RationalQuadraticKernel, SquaredExponentialKernel)

X = np.array([[0.0], [0.7], [1.9]])
r01 = 0.7
r02 = 1.9


def se(r, ls=1.0, sv=1.0):
    # sv acts as a standard deviation, matching the reference numerically
    # (reference: gp/kernel.py exp(2*log_std) in every covariance)
    return sv ** 2 * np.exp(-0.5 * (r / ls) ** 2)


CASES = [
    # (kernel factory, expected k(x0, x1), expected k(x0, x2))
    (lambda: SquaredExponentialKernel(), se(r01), se(r02)),
    (lambda: SquaredExponentialKernel(length_scales=2.0), se(r01, 2.0),
     se(r02, 2.0)),
    (lambda: SquaredExponentialKernel(signal_variance=3.0), se(r01, sv=3.0),
     se(r02, sv=3.0)),
    (lambda: ExponentialKernel(), np.exp(-r01), np.exp(-r02)),
    (lambda: ExponentialKernel(length_scales=0.5), np.exp(-r01 / 0.5),
     np.exp(-r02 / 0.5)),
    (lambda: Matern32Kernel(),
     (1 + np.sqrt(3) * r01) * np.exp(-np.sqrt(3) * r01),
     (1 + np.sqrt(3) * r02) * np.exp(-np.sqrt(3) * r02)),
    (lambda: Matern52Kernel(),
     (1 + np.sqrt(5) * r01 + 5 * r01 ** 2 / 3) * np.exp(-np.sqrt(5) * r01),
     (1 + np.sqrt(5) * r02 + 5 * r02 ** 2 / 3) * np.exp(-np.sqrt(5) * r02)),
    (lambda: MaternKernel(nu=0.5), np.exp(-r01), np.exp(-r02)),
    (lambda: RationalQuadraticKernel(alpha=1.0), (1 + r01 ** 2 / 2) ** -1,
     (1 + r02 ** 2 / 2) ** -1),
    (lambda: RationalQuadraticKernel(alpha=3.0), (1 + r01 ** 2 / 6) ** -3,
     (1 + r02 ** 2 / 6) ** -3),
    (lambda: GammaExponentialKernel(gamma=1.0), np.exp(-0.5 * r01),
     np.exp(-0.5 * r02)),
    (lambda: ConstantKernel(bias=4.2), 4.2 ** 2, 4.2 ** 2),
    (lambda: LinearKernel(), 0.0, 0.0),
    (lambda: PolynomialKernel(degree=3, offset=1.0), 1.0 ** 3, 1.0 ** 3),
    (lambda: DotProductKernel(offset=2.0), 2.0, 2.0),
    (lambda: PeriodicKernel(period=1.0, length_scales=1.0),
     np.exp(-2 * np.sin(np.pi * r01) ** 2),
     np.exp(-2 * np.sin(np.pi * r02) ** 2)),
    # D=1: j = floor(D/2) + q + 1 (Rasmussen eq. 4.21)
    (lambda: PiecewisePolynomialKernel(q=0), (1 - r01) ** 1, 0.0),
    (lambda: PiecewisePolynomialKernel(q=1),
     (1 - r01) ** 3 * (3 * r01 + 1), 0.0),
]


@pytest.mark.parametrize("factory,k01,k02", CASES,
                         ids=[f"case{i}" for i in range(len(CASES))])
def test_kernel_values(factory, k01, k02):
    K = np.asarray(factory()(X))
    np.testing.assert_allclose(K[0, 1], k01, atol=1e-6)
    np.testing.assert_allclose(K[0, 2], k02, atol=1e-6)
    # symmetry
    np.testing.assert_allclose(K, K.T, atol=1e-7)


ALL_KERNELS = [
    SquaredExponentialKernel, ExponentialKernel, Matern32Kernel, Matern52Kernel,
    lambda: MaternKernel(nu=0.5), lambda: RationalQuadraticKernel(alpha=2.0),
    lambda: GammaExponentialKernel(gamma=1.5), lambda: ConstantKernel(),
    LinearKernel, lambda: PolynomialKernel(degree=2), DotProductKernel,
    lambda: PeriodicKernel(period=2.0), lambda: PiecewisePolynomialKernel(q=2),
    NeuralNetworkKernel,
]


@pytest.mark.parametrize("factory", ALL_KERNELS,
                         ids=[f"k{i}" for i in range(len(ALL_KERNELS))])
def test_kernel_psd_and_differentiable(factory):
    k = factory() if callable(factory) else factory
    rng = np.random.default_rng(0)
    Xs = rng.normal(size=(8, 2))
    K = np.asarray(k(Xs))
    assert np.all(np.linalg.eigvalsh(0.5 * (K + K.T)) > -1e-6)
    # hyperparameter gradients exist and are finite (needed for fitting)
    params = k.param_values()
    x1 = jnp.asarray(Xs[0])
    x2 = jnp.asarray(Xs[1])

    def f(p):
        return k.eval(p, x1, x2)

    grads = jax.grad(f)(params)
    for name, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), name


def test_matern_invalid_nu():
    with pytest.raises(ValueError):
        MaternKernel(nu=1.0)


def test_ard_lengthscale_gradients_per_dimension():
    k = SquaredExponentialKernel(length_scales=[1.0, 2.0, 3.0])
    params = k.param_values()
    x1 = jnp.array([0.0, 0.0, 0.0])
    x2 = jnp.array([1.0, 1.0, 1.0])
    g = jax.grad(lambda p: k.eval(p, x1, x2))(params)[k.length_scales.key]
    assert g.shape == (3,)
    # closer length scales have larger gradient magnitude
    assert abs(float(g[0])) > abs(float(g[1])) > abs(float(g[2]))
