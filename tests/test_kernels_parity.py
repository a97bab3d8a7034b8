"""Numeric parity sweep for every kernel and mean family against independently
computed closed forms in the REFERENCE's conventions (reference:
tests/test_kernels.py — 248 tests of hand-computed matrices; tests/test_means.py
— 50 tests). Key convention: sigma-named hyperparameters (signal_variance,
bias, weight_variance, GP.noise_variance) act as standard deviations and are
squared inside the covariance (reference: gp/kernel.py exp(2*log_std) in every
covariance function; pinned by its own test bias=2 -> cov 4,
tests/test_kernels.py:87)."""
import itertools

import numpy as np
import pytest

from hilo_mpc_tpu.ml.gp import (ConstantKernel, ConstantMean, DotProductKernel,
                                ExponentialKernel, GammaExponentialKernel,
                                LinearKernel, LinearMean, Matern32Kernel,
                                Matern52Kernel, MaternKernel,
                                NeuralNetworkKernel, OneMean, PeriodicKernel,
                                PiecewisePolynomialKernel, PolynomialKernel,
                                PolynomialMean, RationalQuadraticKernel,
                                SquaredExponentialKernel, ZeroMean)

# 2-D points, including coincident and distant pairs
X2 = np.array([[0.0, 0.0], [0.5, -0.3], [1.2, 0.8], [0.0, 0.0]])
LS_SETS = [1.0, 0.7, [0.9, 1.6]]     # scalar + ARD length scales
SV_SET = [1.0, 2.0]


def _r2(a, b, ls):
    ls = np.broadcast_to(np.asarray(ls, dtype=float), a.shape)
    d = (a - b) / ls
    return float(np.sum(d * d))


def _expected(kind, a, b, ls, sv, **kw):
    """Independent numpy implementation in the reference's conventions."""
    r2 = _r2(a, b, ls)
    r = np.sqrt(r2)
    v = sv ** 2
    if kind == "se":
        return v * np.exp(-0.5 * r2)
    if kind == "exp":
        return v * np.exp(-r)
    if kind == "m32":
        return v * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    if kind == "m52":
        return v * (1 + np.sqrt(5) * r + 5 * r2 / 3) * np.exp(-np.sqrt(5) * r)
    if kind == "m72":  # p=3 from R&W eq. 4.16
        d = np.sqrt(7) * r
        return v * (1 + d + 0.4 * d ** 2 + d ** 3 / 15) * np.exp(-d)
    if kind == "rq":
        al = kw["alpha"]
        return v * (1 + r2 / (2 * al)) ** (-al)
    if kind == "ge":
        g = kw["gamma"]
        return v * np.exp(-0.5 * r ** g)
    if kind == "per":
        p = kw["period"]
        s = np.sin(np.pi * np.abs(a - b) / p) / np.broadcast_to(
            np.asarray(ls, dtype=float), a.shape)
        return v * np.exp(-2 * np.sum(s * s))
    if kind == "pp":
        q = kw["q"]
        D = a.size
        j = D // 2 + q + 1
        if q == 0:
            f = 1.0
        elif q == 1:
            f = (j + 1) * r + 1
        elif q == 2:
            f = (j ** 2 + 4 * j + 3) / 3 * r2 + (j + 2) * r + 1
        else:
            f = ((j ** 3 + 9 * j ** 2 + 23 * j + 15) / 15 * r ** 3
                 + (6 * j ** 2 + 36 * j + 45) / 15 * r2 + (j + 3) * r + 1)
        return v * max(1 - r, 0.0) ** (j + q) * f
    if kind == "poly":
        return v * (float(a @ b) / kw.get("ls1", 1.0) ** 2
                    + kw["offset"]) ** kw["degree"]
    if kind == "nn":
        w2 = kw["wv"] ** 2
        num = 1 + float(a @ b)
        den = np.sqrt((w2 + 1 + float(a @ a)) * (w2 + 1 + float(b @ b)))
        return v * np.arcsin(num / den)
    raise ValueError(kind)


STATIONARY = [
    ("se", lambda sv, ls: SquaredExponentialKernel(signal_variance=sv,
                                                   length_scales=ls), {}),
    ("exp", lambda sv, ls: ExponentialKernel(signal_variance=sv,
                                             length_scales=ls), {}),
    ("m32", lambda sv, ls: Matern32Kernel(signal_variance=sv,
                                          length_scales=ls), {}),
    ("m52", lambda sv, ls: Matern52Kernel(signal_variance=sv,
                                          length_scales=ls), {}),
    ("m72", lambda sv, ls: MaternKernel(nu=3.5, signal_variance=sv,
                                        length_scales=ls), {}),
    ("rq", lambda sv, ls: RationalQuadraticKernel(signal_variance=sv,
                                                  length_scales=ls, alpha=1.7),
     {"alpha": 1.7}),
    ("ge", lambda sv, ls: GammaExponentialKernel(signal_variance=sv,
                                                 length_scales=ls, gamma=1.4),
     {"gamma": 1.4}),
    ("pp", lambda sv, ls: PiecewisePolynomialKernel(q=2, signal_variance=sv,
                                                    length_scales=ls), {"q": 2}),
    ("per", lambda sv, ls: PeriodicKernel(signal_variance=sv, length_scales=ls,
                                          period=1.3), {"period": 1.3}),
]


@pytest.mark.parametrize(
    "kind,factory,kw,ls,sv",
    [(kind, factory, kw, ls, sv)
     for (kind, factory, kw), ls, sv in itertools.product(STATIONARY, LS_SETS,
                                                          SV_SET)],
    ids=lambda p: str(p) if isinstance(p, (str, float)) else None)
def test_stationary_family_matrix(kind, factory, kw, ls, sv):
    k = factory(sv, ls)
    K = np.asarray(k(X2))
    expect = np.array([[_expected(kind, a, b, ls, sv, **kw) for b in X2]
                       for a in X2])
    np.testing.assert_allclose(K, expect, atol=1e-7, rtol=1e-7)
    # coincident rows 0 and 3 give identical covariance columns
    np.testing.assert_allclose(K[0], K[3], atol=1e-12)


@pytest.mark.parametrize("degree,offset,sv", [(1, 1.0, 1.0), (2, 1.0, 2.0),
                                              (3, 0.5, 1.5)])
def test_polynomial_family_matrix(degree, offset, sv):
    k = PolynomialKernel(degree=degree, signal_variance=sv, offset=offset)
    K = np.asarray(k(X2))
    expect = np.array([[_expected("poly", a, b, 1.0, sv, degree=degree,
                                  offset=offset) for b in X2] for a in X2])
    np.testing.assert_allclose(K, expect, atol=1e-7)


def test_linear_kernel_is_degree1_no_offset():
    k = LinearKernel(signal_variance=2.0)
    K = np.asarray(k(X2))
    expect = 4.0 * (X2 @ X2.T)
    np.testing.assert_allclose(K, expect, atol=1e-7)


def test_dot_product_kernel():
    k = DotProductKernel(signal_variance=1.5, offset=2.0)
    K = np.asarray(k(X2))
    expect = 1.5 ** 2 * (X2 @ X2.T + 2.0)
    np.testing.assert_allclose(K, expect, atol=1e-7)


@pytest.mark.parametrize("sv,wv", [(1.0, 1.0), (2.0, 0.5), (0.7, 3.0)])
def test_neural_network_reference_form(sv, wv):
    k = NeuralNetworkKernel(signal_variance=sv, weight_variance=wv)
    K = np.asarray(k(X2))
    expect = np.array([[_expected("nn", a, b, 1.0, sv, wv=wv) for b in X2]
                       for a in X2])
    np.testing.assert_allclose(K, expect, atol=1e-7)


@pytest.mark.parametrize("bias", [1.0, 2.0, 0.3])
def test_constant_kernel_squares_bias(bias):
    # reference: tests/test_kernels.py:87 pins bias=2 -> covariance 4
    K = np.asarray(ConstantKernel(bias=bias)(X2))
    np.testing.assert_allclose(K, bias ** 2 * np.ones((4, 4)), atol=1e-12)


@pytest.mark.parametrize("q", [0, 1, 2, 3])
def test_piecewise_polynomial_all_degrees(q):
    k = PiecewisePolynomialKernel(q=q, length_scales=2.0)
    K = np.asarray(k(X2))
    expect = np.array([[_expected("pp", a, b, 2.0, 1.0, q=q) for b in X2]
                       for a in X2])
    np.testing.assert_allclose(K, expect, atol=1e-7)
    # compact support: distant pairs are exactly zero
    far = np.array([[0.0, 0.0], [5.0, 5.0]])
    assert np.asarray(PiecewisePolynomialKernel(q=q)(far))[0, 1] == 0.0


def test_cross_covariance_shape_and_values():
    k = SquaredExponentialKernel(length_scales=[0.9, 1.6])
    Xb = np.array([[0.1, 0.1], [1.0, -1.0], [2.0, 2.0]])
    K = np.asarray(k(X2, Xb))
    assert K.shape == (4, 3)
    for i, a in enumerate(X2):
        for j, b in enumerate(Xb):
            np.testing.assert_allclose(
                K[i, j], _expected("se", a, b, [0.9, 1.6], 1.0), atol=1e-7)


def test_active_dims_restrict_inputs():
    k = SquaredExponentialKernel(active_dims=[0])
    K = np.asarray(k(X2))
    expect = np.array([[_expected("se", a[:1], b[:1], 1.0, 1.0) for b in X2]
                       for a in X2])
    np.testing.assert_allclose(K, expect, atol=1e-7)


def test_hyperparameter_names_and_fixing():
    # reference-style bookkeeping (tests/test_kernels.py:17-35)
    k = SquaredExponentialKernel()
    names = [h.name for h in k.hyperparameters]
    assert names == ["SE.signal_variance", "SE.length_scales"]
    k.signal_variance.fixed = True
    assert k.signal_variance.fixed
    c = ConstantKernel()
    assert [h.name for h in c.hyperparameters] == ["Const.bias"]


class TestOperatorAlgebra:
    def test_sum_product_power_scale_values(self):
        k1 = SquaredExponentialKernel()
        k2 = Matern32Kernel(length_scales=0.5)
        K1, K2 = np.asarray(k1(X2)), np.asarray(k2(X2))
        np.testing.assert_allclose(np.asarray((k1 + k2)(X2)), K1 + K2,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray((k1 * k2)(X2)), K1 * K2,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray((k1 ** 3)(X2)), K1 ** 3,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray((2.5 * k1)(X2)), 2.5 * K1,
                                   atol=1e-7)

    def test_scalar_addition_adds_constant(self):
        k = SquaredExponentialKernel()
        K = np.asarray((k + 3.0)(X2))
        np.testing.assert_allclose(K, np.asarray(k(X2)) + 3.0, atol=1e-6)

    def test_negative_constant_rejected(self):
        with pytest.raises(ValueError, match="negative"):
            SquaredExponentialKernel() + (-1.0)

    def test_nested_composition(self):
        k = (SquaredExponentialKernel() + Matern52Kernel()) * ConstantKernel(
            bias=2.0)
        K = np.asarray(k(X2))
        expect = (np.asarray(SquaredExponentialKernel()(X2))
                  + np.asarray(Matern52Kernel()(X2))) * 4.0
        np.testing.assert_allclose(K, expect, atol=1e-7)
        # hyperparameters aggregate across the tree
        assert len(k.hyperparameters) == 5

    def test_composite_psd(self):
        rng = np.random.default_rng(1)
        Xs = rng.normal(size=(10, 2))
        k = (SquaredExponentialKernel() * Matern32Kernel()
             + 0.5 * RationalQuadraticKernel())
        K = np.asarray(k(Xs))
        assert np.min(np.linalg.eigvalsh(0.5 * (K + K.T))) > -1e-8


class TestMatern:
    def test_generic_half_integers_decrease_with_distance(self):
        for nu in (0.5, 1.5, 2.5, 3.5, 4.5):
            k = MaternKernel(nu=nu)
            vals = np.asarray(k(np.array([[0.0], [0.5], [1.5], [3.0]])))[0]
            assert np.all(np.diff(vals[:4]) < 0)

    def test_invalid_nu(self):
        for bad in (1.0, 2.0, -0.5, 0.2):
            with pytest.raises(ValueError):
                MaternKernel(nu=bad)

    def test_high_nu_approaches_se(self):
        # Matern -> SE as nu -> inf
        kse = np.asarray(SquaredExponentialKernel()(X2))
        km = np.asarray(MaternKernel(nu=20.5)(X2))
        np.testing.assert_allclose(km, kse, atol=0.02)


class TestMeansParity:
    X = np.array([[1.0, 2.0], [0.5, -1.0], [0.0, 0.0]])

    def test_zero_one_constant(self):
        np.testing.assert_allclose(np.asarray(ZeroMean()(self.X)), 0.0)
        np.testing.assert_allclose(np.asarray(OneMean()(self.X)), 1.0)
        np.testing.assert_allclose(np.asarray(ConstantMean(2.5)(self.X)), 2.5)

    def test_linear_mean_ard_coefficients(self):
        m = LinearMean(coefficient=[2.0, -1.0])
        np.testing.assert_allclose(np.asarray(m(self.X)),
                                   self.X @ np.array([2.0, -1.0]), atol=1e-8)

    def test_polynomial_mean(self):
        # reference: (c^T x + offset)^p, coefficients used raw (mean.py:443-449)
        m = PolynomialMean(degree=2, coefficient=[1.0, 0.5], offset=1.0)
        expect = (self.X @ np.array([1.0, 0.5]) + 1.0) ** 2
        np.testing.assert_allclose(np.asarray(m(self.X)), expect, atol=1e-8)

    def test_mean_operator_algebra(self):
        m = 2.0 * LinearMean(coefficient=[1.0, 0.0]) + ConstantMean(3.0)
        expect = 2.0 * self.X[:, 0] + 3.0
        np.testing.assert_allclose(np.asarray(m(self.X)), expect, atol=1e-8)
        mp = LinearMean(coefficient=[1.0, 0.0]) ** 2
        np.testing.assert_allclose(np.asarray(mp(self.X)), self.X[:, 0] ** 2,
                                   atol=1e-8)

    def test_mean_active_dims(self):
        m = LinearMean(coefficient=[1.5], active_dims=[1])
        np.testing.assert_allclose(np.asarray(m(self.X)), 1.5 * self.X[:, 1],
                                   atol=1e-8)
