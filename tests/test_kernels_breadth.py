"""Kernel test breadth to reference parity (reference: tests/test_kernels.py —
248 cases sweeping, per kernel family: hyperparameter registration, fixed
flags, ARD variants, active_dims subsets, numeric K(X), rectangular K(X, X̄),
and dimension-mismatch errors).

Structure: `_KernelCaseMatrix` holds the per-family case matrix as test
methods; one subclass per kernel family instantiates it (pytest collects every
inherited method per subclass, reproducing the reference's family x case grid),
and kernel-specific construction/validation cases follow as explicit tests.
Expected values come from the independent closed forms in
tests/test_kernels_parity.py (numpy, reference conventions: sigma-named
hyperparameters are standard deviations, squared in the covariance)."""
import numpy as np
import pytest

from test_kernels_parity import _expected
from hilo_mpc_tpu.ml.gp import (ConstantKernel, DotProductKernel,
                                ExponentialKernel, GammaExponentialKernel,
                                LinearKernel, Matern32Kernel, Matern52Kernel,
                                MaternKernel, NeuralNetworkKernel,
                                PeriodicKernel, PiecewisePolynomialKernel,
                                PolynomialKernel, RationalQuadraticKernel,
                                SquaredExponentialKernel, Warp)
from hilo_mpc_tpu.ml.gp.kernels import Power, Product, Scale, Sum

X = np.array([[0.1, -0.4], [0.8, 0.2], [-0.3, 0.9]])
XB = np.array([[0.0, 0.0], [1.0, -1.0], [0.5, 0.5], [-0.2, 0.1]])
X1 = np.array([[0.0], [0.7], [-1.1]])


class _KernelCaseMatrix:
    """Per-family case matrix (mirrors the reference's per-kernel sweep)."""

    kind: str = ""
    kw: dict = {}
    ard = True                 # family supports per-dimension length scales

    def make(self, **kwargs):
        raise NotImplementedError

    def expected(self, A, B, ls=1.0, sv=1.0):
        return np.array([[_expected(self.kind, a, b, ls, sv, **self.kw)
                          for b in B] for a in A])

    # -- construction ---------------------------------------------------------
    def test_hyperparameters_registered(self):
        k = self.make()
        names = [h.name for h in k.hyperparameters]
        assert any(n.endswith("signal_variance") for n in names)
        assert len(names) == len(set(names))
        assert all(h.value.size >= 1 for h in k.hyperparameters)

    def test_hyperparameters_default_unfixed_except_shape_params(self):
        k = self.make()
        sv = [h for h in k.hyperparameters if h.name.endswith("signal_variance")]
        assert sv and not sv[0].fixed

    # -- numeric evaluation ---------------------------------------------------
    def test_numeric_call_square(self):
        k = self.make(signal_variance=1.3)
        np.testing.assert_allclose(np.asarray(k(X)),
                                   self.expected(X, X, sv=1.3),
                                   atol=1e-7, rtol=1e-7)

    def test_numeric_call_x_x_bar_rectangular(self):
        k = self.make()
        K = np.asarray(k(X, XB))
        assert K.shape == (3, 4)
        np.testing.assert_allclose(K, self.expected(X, XB), atol=1e-7,
                                   rtol=1e-7)

    def test_symmetry_and_psd(self):
        k = self.make()
        K = np.asarray(k(X))
        np.testing.assert_allclose(K, K.T, atol=1e-8)
        assert np.linalg.eigvalsh(K).min() > -1e-7

    def test_diag_matches_gram_diagonal(self):
        k = self.make()
        np.testing.assert_allclose(np.asarray(k.diag(X)),
                                   np.diag(np.asarray(k(X))), atol=1e-7)

    def test_one_dimensional_input(self):
        k = self.make()
        K = np.asarray(k(X1))
        np.testing.assert_allclose(K, self.expected(X1, X1), atol=1e-7,
                                   rtol=1e-7)

    # -- ARD / active dims ----------------------------------------------------
    def test_ard_lengthscales(self):
        if not self.ard:
            pytest.skip("family has no per-dimension length scales")
        ls = [0.6, 1.4]
        k = self.make(length_scales=ls)
        np.testing.assert_allclose(np.asarray(k(X)),
                                   self.expected(X, X, ls=ls),
                                   atol=1e-7, rtol=1e-7)

    def test_ard_dimension_mismatch_raises(self):
        if not self.ard:
            pytest.skip("family has no per-dimension length scales")
        k = self.make(length_scales=[1.0, 2.0, 3.0])
        with pytest.raises(ValueError, match="length scales"):
            k(X)

    def test_active_dims_subset(self):
        if not self.ard:
            pytest.skip("needs length-scale family for a clean closed form")
        k = self.make(active_dims=[1])
        Ksub = self.expected(X[:, 1:2], X[:, 1:2])
        np.testing.assert_allclose(np.asarray(k(X)), Ksub, atol=1e-7,
                                   rtol=1e-7)

    def test_active_dims_out_of_range_raises(self):
        k = self.make(active_dims=[5])
        with pytest.raises(ValueError, match="active_dims"):
            k(X)

    # -- input validation -----------------------------------------------------
    def test_x_x_bar_dimension_mismatch_raises(self):
        k = self.make()
        with pytest.raises(ValueError, match="input space"):
            k(X, np.random.default_rng(0).standard_normal((3, 5)))


class TestSEMatrix(_KernelCaseMatrix):
    kind = "se"

    def make(self, **kw):
        return SquaredExponentialKernel(**kw)


class TestExponentialMatrix(_KernelCaseMatrix):
    kind = "exp"

    def make(self, **kw):
        return ExponentialKernel(**kw)


class TestMatern32Matrix(_KernelCaseMatrix):
    kind = "m32"

    def make(self, **kw):
        return Matern32Kernel(**kw)


class TestMatern52Matrix(_KernelCaseMatrix):
    kind = "m52"

    def make(self, **kw):
        return Matern52Kernel(**kw)


class TestMatern72Matrix(_KernelCaseMatrix):
    kind = "m72"

    def make(self, **kw):
        return MaternKernel(nu=3.5, **kw)


class TestRQMatrix(_KernelCaseMatrix):
    kind = "rq"
    kw = {"alpha": 1.7}

    def make(self, **kw):
        return RationalQuadraticKernel(alpha=1.7, **kw)


class TestGammaExpMatrix(_KernelCaseMatrix):
    kind = "ge"
    kw = {"gamma": 1.4}

    def make(self, **kw):
        return GammaExponentialKernel(gamma=1.4, **kw)


class TestPiecewisePolyMatrix(_KernelCaseMatrix):
    kind = "pp"
    kw = {"q": 2}

    def make(self, **kw):
        return PiecewisePolynomialKernel(q=2, **kw)


class TestPeriodicMatrix(_KernelCaseMatrix):
    kind = "per"
    kw = {"period": 1.3}

    def make(self, **kw):
        return PeriodicKernel(period=1.3, **kw)


class TestNeuralNetworkMatrix(_KernelCaseMatrix):
    kind = "nn"
    kw = {"wv": 1.0}
    ard = False

    def make(self, **kw):
        return NeuralNetworkKernel(**kw)


class TestPolynomialMatrix(_KernelCaseMatrix):
    kind = "poly"
    kw = {"offset": 1.0, "degree": 2}
    ard = False

    def make(self, **kw):
        return PolynomialKernel(degree=2, **kw)


# -- kernel-specific construction & validation --------------------------------


class TestKernelSpecific:
    def test_constant_kernel_value_is_bias_squared(self):
        K = np.asarray(ConstantKernel(bias=2.0)(X))
        np.testing.assert_allclose(K, 4.0 * np.ones((3, 3)), atol=1e-12)

    def test_constant_kernel_bounds_fixed(self):
        k = ConstantKernel(bias=1.5, bounds="fixed")
        assert k.bias.fixed

    def test_gamma_exponential_gamma_range(self):
        for g in (0.0, -0.5, 2.5):
            with pytest.raises(ValueError, match="gamma"):
                GammaExponentialKernel(gamma=g)
        GammaExponentialKernel(gamma=2.0)  # boundary is valid

    def test_gamma_two_equals_se(self):
        kg = GammaExponentialKernel(gamma=2.0)
        ks = SquaredExponentialKernel()
        np.testing.assert_allclose(np.asarray(kg(X)), np.asarray(ks(X)),
                                   atol=1e-6)

    def test_matern_nu_must_be_half_integer(self):
        for nu in (1.0, 2.0, 0.4):
            with pytest.raises(ValueError, match="half-integer"):
                MaternKernel(nu=nu)

    def test_matern_nu_half_is_exponential(self):
        np.testing.assert_allclose(np.asarray(MaternKernel(nu=0.5)(X)),
                                   np.asarray(ExponentialKernel()(X)),
                                   atol=1e-7)

    def test_piecewise_poly_q_range(self):
        for q in (-1, 4, 10):
            with pytest.raises(ValueError, match="q"):
                PiecewisePolynomialKernel(q=q)
        for q in (0, 1, 2, 3):
            PiecewisePolynomialKernel(q=q)

    def test_piecewise_poly_compact_support(self):
        k = PiecewisePolynomialKernel(q=0, length_scales=1.0)
        far = np.array([[0.0, 0.0], [5.0, 5.0]])
        K = np.asarray(k(far))
        assert K[0, 1] == 0.0 and K[1, 0] == 0.0 and K[0, 0] > 0

    def test_polynomial_degree_validation(self):
        with pytest.raises(ValueError, match="degree"):
            PolynomialKernel(degree=0)

    def test_linear_kernel_is_degree_one_polynomial_no_offset(self):
        kl = LinearKernel()
        K = np.asarray(kl(X))
        expect = X @ X.T
        np.testing.assert_allclose(K, expect, atol=1e-7)

    def test_dot_product_offset_enters(self):
        k = DotProductKernel()
        K = np.asarray(k(X))
        np.testing.assert_allclose(K, X @ X.T + 1.0, atol=1e-6)

    def test_positive_hyperparameter_rejects_nonpositive(self):
        with pytest.raises(ValueError, match="> 0"):
            SquaredExponentialKernel(signal_variance=-1.0)
        with pytest.raises(ValueError, match="> 0"):
            SquaredExponentialKernel(length_scales=0.0)

    def test_hyperparameter_value_setter_validates(self):
        k = SquaredExponentialKernel()
        with pytest.raises(ValueError, match="> 0"):
            k.hyperparameters[0].value = -2.0


class TestOperatorAlgebra:
    def test_sum_of_kernels(self):
        k = SquaredExponentialKernel() + Matern32Kernel()
        assert isinstance(k, Sum)
        np.testing.assert_allclose(
            np.asarray(k(X)),
            np.asarray(SquaredExponentialKernel()(X))
            + np.asarray(Matern32Kernel()(X)), atol=1e-7)

    def test_sum_with_constant(self):
        k = SquaredExponentialKernel() + 2.0
        np.testing.assert_allclose(
            np.asarray(k(X)),
            np.asarray(SquaredExponentialKernel()(X)) + 2.0, atol=1e-6)

    def test_sum_negative_constant_rejected(self):
        with pytest.raises(ValueError, match="negative"):
            SquaredExponentialKernel() + (-1.0)

    def test_product_of_kernels(self):
        k = SquaredExponentialKernel() * PeriodicKernel()
        assert isinstance(k, Product)
        np.testing.assert_allclose(
            np.asarray(k(X)),
            np.asarray(SquaredExponentialKernel()(X))
            * np.asarray(PeriodicKernel()(X)), atol=1e-7)

    def test_scale_by_scalar(self):
        k = 3.0 * SquaredExponentialKernel()
        assert isinstance(k, Scale)
        np.testing.assert_allclose(
            np.asarray(k(X)), 3.0 * np.asarray(SquaredExponentialKernel()(X)),
            atol=1e-7)

    def test_power(self):
        k = SquaredExponentialKernel() ** 2
        assert isinstance(k, Power)
        np.testing.assert_allclose(
            np.asarray(k(X)), np.asarray(SquaredExponentialKernel()(X)) ** 2,
            atol=1e-7)

    def test_operator_hyperparameters_aggregate_unique(self):
        a, b = SquaredExponentialKernel(), Matern32Kernel()
        k = a + b
        hps = k.hyperparameters
        assert len(hps) == 4
        assert len({id(h) for h in hps}) == 4

    def test_nested_operators_with_active_dims(self):
        ka = SquaredExponentialKernel(active_dims=[0])
        kb = Matern52Kernel(active_dims=[1])
        k = ka * kb + 0.5
        Ka = np.array([[_expected("se", a, b, 1.0, 1.0) for b in X[:, :1]]
                       for a in X[:, :1]])
        Kb = np.array([[_expected("m52", a, b, 1.0, 1.0) for b in X[:, 1:]]
                       for a in X[:, 1:]])
        np.testing.assert_allclose(np.asarray(k(X)), Ka * Kb + 0.5, atol=1e-6)

    def test_operator_checks_child_dims(self):
        k = SquaredExponentialKernel(length_scales=[1.0, 2.0, 3.0]) \
            + Matern32Kernel()
        with pytest.raises(ValueError, match="length scales"):
            k(X)

    def test_warp_composes_with_operators(self):
        import jax.numpy as jnp

        k = Warp(SquaredExponentialKernel(), jnp.tanh) + ConstantKernel()
        K = np.asarray(k(X))
        base = np.asarray(SquaredExponentialKernel()(np.tanh(X))) + 1.0
        np.testing.assert_allclose(K, base, atol=1e-7)
