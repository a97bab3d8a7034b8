"""ML layer tests: kernels/means numerics (reference tier: tests/test_kernels.py
hand-computed matrices), GP fit + prediction, ANN training, hybrid substitution."""
import numpy as np
import pytest

from hilo_mpc_tpu import (ANN, GP, Dense, GPArray, Layer, Model)
from hilo_mpc_tpu.ml.gp import (ConstantKernel, ExponentialKernel,
                                GammaExponentialKernel, LinearKernel,
                                Matern32Kernel, Matern52Kernel,
                                NeuralNetworkKernel, PeriodicKernel,
                                PiecewisePolynomialKernel, PolynomialKernel,
                                RationalQuadraticKernel,
                                SquaredExponentialKernel)
from hilo_mpc_tpu.ml.gp import ConstantMean, LinearMean, OneMean, PolynomialMean, ZeroMean


X1 = np.array([[0.0], [1.0], [2.0]])


class TestKernels:
    def test_se_matrix(self):
        k = SquaredExponentialKernel(length_scales=1.0)
        K = np.asarray(k(X1))
        expect = np.exp(-0.5 * np.array([[0, 1, 4], [1, 0, 1], [4, 1, 0]], float))
        np.testing.assert_allclose(K, expect, atol=1e-7)

    def test_se_signal_variance_and_ard(self):
        k = SquaredExponentialKernel(signal_variance=4.0,
                                     length_scales=[2.0, 0.5])
        X = np.array([[0.0, 0.0], [2.0, 1.0]])
        K = np.asarray(k(X))
        r2 = (2.0 / 2.0) ** 2 + (1.0 / 0.5) ** 2
        # signal_variance acts as a standard deviation (reference convention)
        np.testing.assert_allclose(K[0, 1], 16.0 * np.exp(-0.5 * r2), atol=1e-7)
        np.testing.assert_allclose(np.diag(K), [16.0, 16.0], atol=1e-6)

    def test_constant(self):
        k = ConstantKernel(bias=2.5)
        np.testing.assert_allclose(np.asarray(k(X1)), 6.25 * np.ones((3, 3)),
                                   atol=1e-8)

    def test_exponential(self):
        k = ExponentialKernel(length_scales=2.0)
        K = np.asarray(k(X1))
        np.testing.assert_allclose(K[0, 2], np.exp(-1.0), atol=1e-6)

    def test_matern32(self):
        k = Matern32Kernel()
        K = np.asarray(k(X1))
        r = np.sqrt(3.0)
        np.testing.assert_allclose(K[0, 1], (1 + r) * np.exp(-r), atol=1e-6)

    def test_matern52(self):
        k = Matern52Kernel()
        K = np.asarray(k(X1))
        r = np.sqrt(5.0)
        np.testing.assert_allclose(K[0, 1], (1 + r + 5.0 / 3.0) * np.exp(-r),
                                   atol=1e-6)

    def test_gamma_exponential_reduces_to_se(self):
        kg = GammaExponentialKernel(gamma=2.0)
        ks = SquaredExponentialKernel()
        np.testing.assert_allclose(np.asarray(kg(X1)), np.asarray(ks(X1)),
                                   atol=1e-6)

    def test_gamma_bounds(self):
        with pytest.raises(ValueError):
            GammaExponentialKernel(gamma=3.0)

    def test_rational_quadratic_limit(self):
        # alpha -> inf approaches SE
        kr = RationalQuadraticKernel(alpha=1e6)
        ks = SquaredExponentialKernel()
        np.testing.assert_allclose(np.asarray(kr(X1)), np.asarray(ks(X1)),
                                   atol=1e-4)

    def test_rq_value(self):
        k = RationalQuadraticKernel(alpha=2.0)
        np.testing.assert_allclose(np.asarray(k(X1))[0, 1],
                                   (1 + 1.0 / 4.0) ** -2.0, atol=1e-7)

    def test_linear(self):
        k = LinearKernel()
        X = np.array([[1.0], [2.0], [3.0]])
        np.testing.assert_allclose(np.asarray(k(X)), np.outer([1, 2, 3], [1, 2, 3]),
                                   atol=1e-6)

    def test_polynomial(self):
        k = PolynomialKernel(degree=2, offset=1.0)
        X = np.array([[1.0], [2.0]])
        np.testing.assert_allclose(np.asarray(k(X))[0, 1], (2.0 + 1.0) ** 2,
                                   atol=1e-6)

    def test_polynomial_degree_validation(self):
        with pytest.raises(ValueError):
            PolynomialKernel(degree=0)

    def test_periodic(self):
        k = PeriodicKernel(period=2.0, length_scales=1.0)
        K = np.asarray(k(X1))
        # |x-y| = 2 = full period -> sin(pi) = 0 -> k = sv
        np.testing.assert_allclose(K[0, 2], 1.0, atol=1e-6)
        np.testing.assert_allclose(K[0, 1], np.exp(-2.0 * np.sin(np.pi / 2) ** 2),
                                   atol=1e-6)

    def test_piecewise_polynomial_compact_support(self):
        k = PiecewisePolynomialKernel(q=0, length_scales=1.0)
        K = np.asarray(k(X1))
        assert K[0, 2] == 0.0  # r = 2 > 1: outside support
        assert K[0, 0] == pytest.approx(1.0)

    def test_pp_q_validation(self):
        with pytest.raises(ValueError):
            PiecewisePolynomialKernel(q=5)

    def test_neural_network_psd(self):
        k = NeuralNetworkKernel(weight_variance=2.0)
        X = np.random.default_rng(0).normal(size=(6, 2))
        K = np.asarray(k(X))
        assert np.all(np.linalg.eigvalsh(K) > -1e-8)

    def test_active_dims(self):
        k = SquaredExponentialKernel(active_dims=[0])
        X = np.array([[0.0, 100.0], [1.0, -50.0]])
        K = np.asarray(k(X))
        np.testing.assert_allclose(K[0, 1], np.exp(-0.5), atol=1e-7)

    def test_operator_algebra(self):
        k1 = SquaredExponentialKernel()
        k2 = ConstantKernel(bias=2.0)
        Ksum = np.asarray((k1 + k2)(X1))
        Kprod = np.asarray((k1 * k2)(X1))
        Kscale = np.asarray((3.0 * k1)(X1))
        Kpow = np.asarray((k1 ** 2)(X1))
        K1 = np.asarray(k1(X1))
        # ConstantKernel bias is squared in the covariance (reference convention)
        np.testing.assert_allclose(Ksum, K1 + 4.0, atol=1e-7)
        np.testing.assert_allclose(Kprod, K1 * 4.0, atol=1e-7)
        np.testing.assert_allclose(Kscale, 3.0 * K1, atol=1e-7)
        np.testing.assert_allclose(Kpow, K1 ** 2, atol=1e-7)

    def test_cross_covariance(self):
        k = SquaredExponentialKernel()
        K = np.asarray(k(X1, np.array([[0.5]])))
        assert K.shape == (3, 1)
        np.testing.assert_allclose(K[0, 0], np.exp(-0.5 * 0.25), atol=1e-7)


class TestMeans:
    def test_zero_one_constant(self):
        X = np.array([[1.0], [2.0]])
        np.testing.assert_allclose(np.asarray(ZeroMean()(X)), [0, 0])
        np.testing.assert_allclose(np.asarray(OneMean()(X)), [1, 1])
        np.testing.assert_allclose(np.asarray(ConstantMean(3.5)(X)), [3.5, 3.5])

    def test_linear(self):
        m = LinearMean(coefficient=[2.0, -1.0])
        X = np.array([[1.0, 1.0], [2.0, 0.0]])
        np.testing.assert_allclose(np.asarray(m(X)), [1.0, 4.0])

    def test_polynomial(self):
        m = PolynomialMean(degree=2, coefficient=[1.0], offset=1.0)
        X = np.array([[1.0], [2.0]])
        np.testing.assert_allclose(np.asarray(m(X)), [4.0, 9.0])

    def test_mean_algebra(self):
        m = ConstantMean(2.0) + LinearMean(coefficient=[1.0])
        X = np.array([[3.0]])
        np.testing.assert_allclose(np.asarray(m(X)), [5.0])
        m2 = 2.0 * ConstantMean(2.0)
        np.testing.assert_allclose(np.asarray(m2(X)), [4.0])


class TestGP:
    def test_single_label_enforced(self):
        with pytest.raises(ValueError):
            GP(["x"], ["y1", "y2"])

    def test_interpolates_noise_free(self):
        rng = np.random.default_rng(0)
        X = np.linspace(0, 4, 12)[:, None]
        y = np.sin(X[:, 0])
        gp = GP(["x"], ["y"], noise_variance=1e-4)
        gp.noise_variance.fixed = True
        gp.set_training_data(X, y)
        gp.setup()
        mu, var = gp.predict(X)
        np.testing.assert_allclose(mu, y, atol=1e-4)
        assert np.all(var < 1e-4)

    def test_fit_improves_lml_and_recovery(self):
        rng = np.random.default_rng(1)
        X = np.linspace(0, 6, 40)[:, None]
        y = np.sin(X[:, 0]) + 0.05 * rng.standard_normal(40)
        gp = GP(["x"], ["y"], noise_variance=0.5)
        gp.set_training_data(X, y)
        gp.setup()
        lml0 = gp.log_marginal_likelihood
        gp.fit_model()
        assert gp.log_marginal_likelihood > lml0
        # noise value is a standard deviation; should land near the true 0.05
        sn2 = float(np.squeeze(gp.noise_variance.value)) ** 2
        assert 2e-4 < sn2 < 2e-2
        mu, _ = gp.predict(X)
        assert np.sqrt(np.mean((mu - np.sin(X[:, 0])) ** 2)) < 0.05

    def test_predict_quantiles_order(self):
        X = np.linspace(0, 1, 10)[:, None]
        gp = GP(["x"], ["y"])
        gp.set_training_data(X, X[:, 0])
        gp.setup()
        lo, hi = gp.predict_quantiles(X)
        assert np.all(lo < hi)

    def test_traceable_predict_embeds_in_jit(self):
        import jax
        import jax.numpy as jnp

        X = np.linspace(0, 1, 8)[:, None]
        gp = GP(["x"], ["y"], noise_variance=1e-3)  # near-interpolating
        gp.set_training_data(X, X[:, 0] ** 2)
        gp.setup()
        fn = gp.predict_fn()

        @jax.jit
        def g(x):
            mu, var = fn(x)
            return mu * 2.0

        val = float(g(jnp.array([0.5])))
        assert abs(val - 2 * 0.25) < 0.1

    def test_gparray(self):
        arr = GPArray(2)
        X = np.linspace(0, 1, 10)[:, None]
        for i in range(2):
            gp = GP(["x"], [f"y{i}"], noise_variance=1e-3)
            gp.set_training_data(X, (i + 1) * X[:, 0])
            arr[i] = gp
        arr.setup()
        mu, var = arr.predict(X)
        assert mu.shape == (10, 2)
        np.testing.assert_allclose(mu[:, 1], 2 * X[:, 0], atol=1e-3)

    def test_prior_contributes(self):
        from hilo_mpc_tpu.ml.priors import GaussianPrior

        X = np.linspace(0, 1, 10)[:, None]
        gp = GP(["x"], ["y"])
        gp.set_training_data(X, np.sin(X[:, 0]))
        gp.kernel.length_scales.prior = GaussianPrior(mean=0.0, variance=1.0)
        gp.setup()
        gp.fit_model(max_iter=50)
        assert gp.is_setup()


class TestANN:
    def test_layer_validation(self):
        with pytest.raises(ValueError):
            Layer.dense(3, activation="nope")
        with pytest.raises(ValueError):
            Layer.dropout(1.5)

    def test_fits_quadratic(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, size=(400, 1))
        y = X[:, 0] ** 2
        ann = ANN(["x"], ["y"])
        ann.add_layers([Dense(32, activation="tanh"), Dense(32, activation="tanh")])
        ann.setup()
        ann.train(batch_size=64, epochs=300, X=X, y=y, patience=100)
        pred = ann.predict(np.array([[0.5], [-0.5], [0.0]]))
        np.testing.assert_allclose(pred.ravel(), [0.25, 0.25, 0.0], atol=0.05)

    def test_dataframe_like_data(self):
        data = {"a": np.linspace(0, 1, 50), "b": np.linspace(1, 2, 50),
                "out": np.linspace(0, 1, 50) * 2}
        ann = ANN(["a", "b"], ["out"])
        ann.add_layers(Dense(8, activation="tanh"))
        ann.add_data_set(data)
        ann.train(batch_size=16, epochs=200)
        assert ann.history["loss"][-1] < ann.history["loss"][0]


class TestHybrid:
    def _bio_model(self):
        import jax.numpy as jnp

        m = Model(name="bio")
        m.set_dynamical_states(["Xc", "S"])
        m.set_inputs(["D"])
        m.set_parameters(["Sf", "mu"])
        m.set_dynamical_equations(
            lambda x, u, p: jnp.array([p[1] * x[0] - u[0] * x[0],
                                       -2 * p[1] * x[0] - u[0] * (x[1] - p[0])]))
        return m

    def test_substitute_ann(self):
        # train an ANN to produce mu(S) = 0.5*S/(1+S), substitute for parameter mu
        rng = np.random.default_rng(0)
        S = rng.uniform(0, 5, size=(500, 1))
        mu = 0.5 * S[:, 0] / (1 + S[:, 0])
        ann = ANN(["S"], ["mu"])
        ann.add_layers(Dense(16, activation="tanh"))
        ann.train(batch_size=64, epochs=300, X=S, y=mu, patience=100)

        model = self._bio_model()
        assert model.n_p == 2
        model.substitute_from(ann)
        assert model.n_p == 1
        assert model.parameters == ["Sf"]
        model.setup(dt=0.1)
        model.set_initial_conditions([0.1, 2.0])
        out = model.simulate(u=np.array([[0.05]]), p=np.array([10.0]), steps=1)
        assert np.all(np.isfinite(out["x"]))
        # growth rate at S=2 should be close to 0.5*2/3
        mu_true = 0.5 * 2.0 / 3.0
        dx = (out["x"][-1, 0] - 0.1) / 0.1
        assert abs(dx - (mu_true - 0.05) * 0.1 / 0.1 * 0.1) < 0.05

    def test_add_operator_returns_new_model(self):
        rng = np.random.default_rng(0)
        S = rng.uniform(0, 5, size=(200, 1))
        ann = ANN(["S"], ["mu"])
        ann.add_layers(Dense(8, activation="tanh"))
        ann.train(batch_size=32, epochs=100, X=S, y=0.3 * S[:, 0])
        base = self._bio_model()
        hybrid = base + ann
        assert base.n_p == 2 and hybrid.n_p == 1

    def test_substitute_gp(self):
        X = np.linspace(0.1, 4, 20)[:, None]
        y = 0.5 * X[:, 0] / (1 + X[:, 0])
        gp = GP(["S"], ["mu"], noise_variance=1e-3)
        gp.set_training_data(X, y)
        gp.setup()
        model = self._bio_model()
        model.substitute_from(gp)
        assert model.parameters == ["Sf"]
        model.setup(dt=0.1)
        model.set_initial_conditions([0.1, 2.0])
        out = model.simulate(u=np.array([[0.0]]), p=np.array([10.0]), steps=1)
        assert np.all(np.isfinite(out["x"]))

    def test_unknown_label_raises(self):
        ann = ANN(["S"], ["not_a_param"])
        ann.add_layers(Dense(4))
        ann.train(batch_size=8, epochs=5, X=np.ones((10, 1)), y=np.ones(10))
        with pytest.raises(ValueError, match="not model parameters"):
            self._bio_model().substitute_from(ann)


class TestTensorBoard:
    def test_training_writes_event_files(self, tmp_path):
        pytest.importorskip("torch.utils.tensorboard")
        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, size=(100, 1))
        ann = ANN(["x"], ["y"])
        ann.add_layers(Dense(4, activation="tanh"))
        ann.train(batch_size=32, epochs=5, X=X, y=X[:, 0],
                  tensorboard=True, tensorboard_log_dir=str(tmp_path / "tb"))
        files = list((tmp_path / "tb").rglob("events.out.tfevents.*"))
        assert files, "no tensorboard event files written"


class TestGPComposite:
    def test_fit_with_mean_function_and_composite_kernel(self):
        from hilo_mpc_tpu.ml.gp import (LinearMean, Matern52Kernel,
                                        SquaredExponentialKernel)

        rng = np.random.default_rng(0)
        X = np.linspace(0, 5, 40)[:, None]
        y = 0.8 * X[:, 0] + 0.3 * np.sin(3 * X[:, 0]) + 0.02 * rng.standard_normal(40)
        gp = GP(["x"], ["y"], kernel=SquaredExponentialKernel() + Matern52Kernel(),
                mean=LinearMean(coefficient=[0.5]), noise_variance=1e-3)
        gp.set_training_data(X, y)
        gp.setup()
        lml0 = gp.log_marginal_likelihood
        gp.fit_model(max_iter=80)
        assert gp.log_marginal_likelihood > lml0
        mu, _ = gp.predict(X)
        assert np.sqrt(np.mean((mu - (0.8 * X[:, 0] + 0.3 * np.sin(3 * X[:, 0]))) ** 2)) < 0.05


class TestGPArraySubstitution:
    def test_gparray_substitutes_multiple_parameters(self):
        import jax.numpy as jnp

        # model with two unknown rates, each supplied by its own GP
        m = Model(name="two_rates")
        m.set_dynamical_states(["a", "b"])
        m.set_inputs("u")
        m.set_parameters(["r1", "r2"])
        m.set_dynamical_equations(
            lambda x, u, p: jnp.array([-p[0] * x[0] + u[0], -p[1] * x[1]]))

        X = np.linspace(0.1, 2.0, 15)[:, None]
        arr = GPArray(2)
        for i, (label, fn) in enumerate([("r1", lambda s: 0.5 * s),
                                         ("r2", lambda s: 1.0 + 0.1 * s)]):
            gp = GP(["a"], [label], noise_variance=1e-4)
            gp.noise_variance.fixed = True
            gp.set_training_data(X, fn(X[:, 0]))
            arr[i] = gp
        arr.setup()

        m.substitute_from(arr)
        assert m.parameters == []
        m.setup(dt=0.05)
        m.set_initial_conditions([1.0, 1.0])
        out = m.simulate(u=np.zeros((5, 1)), steps=5)
        assert np.all(np.isfinite(out["x"]))
        # effective r2 at a=1: 1.1 -> b decays accordingly
        np.testing.assert_allclose(out["x"][-1, 1],
                                   np.exp(-1.1 * 0.25), rtol=0.05)


class TestGPAdamFit:
    def test_on_device_adam_improves_lml(self):
        rng = np.random.default_rng(3)
        X = np.linspace(0, 6, 40)[:, None]
        y = np.sin(X[:, 0]) + 0.05 * rng.standard_normal(40)
        gp = GP(["x"], ["y"], noise_variance=0.3)
        gp.set_training_data(X, y)
        gp.setup()
        lml0 = gp.log_marginal_likelihood
        gp.fit_model(solver="adam", max_iter=300, learning_rate=5e-2)
        assert gp.log_marginal_likelihood > lml0
        sn2 = float(np.squeeze(gp.noise_variance.value)) ** 2
        assert sn2 < 0.02  # pulled toward the true 0.0025


class TestGPFactoryContracts:
    """Constructor string contracts (reference: tests/test_GPs.py:68-194):
    unknown names raise ValueError; still-unimplemented names raise
    NotImplementedError. Logistic / Student's-t likelihoods and Laplace
    inference are now IMPLEMENTED (beyond the reference's stubs —
    tests/test_gp_laplace.py), so they construct fine with
    inference='laplace' and combining them with exact inference is a
    configuration error."""

    def test_laplacian_likelihood_raises_not_implemented(self):
        with pytest.raises(NotImplementedError):
            GP(["x"], ["z"], likelihood="Laplacian")

    @pytest.mark.parametrize("lik", ["Logistic", "Students t"])
    def test_non_gaussian_likelihood_requires_laplace(self, lik):
        with pytest.raises(ValueError, match="exact inference requires"):
            GP(["x"], ["z"], likelihood=lik)
        GP(["x"], ["z"], likelihood=lik, inference="laplace")  # constructs

    def test_unknown_likelihood_raises_value_error(self):
        with pytest.raises(ValueError, match="not recognized"):
            GP(["x"], ["z"], likelihood="Gumbel")

    @pytest.mark.parametrize("inf", ["Variational Bayes", "Kullback Leibler"])
    def test_declared_inference_raise_not_implemented(self, inf):
        with pytest.raises(NotImplementedError):
            GP(["x"], ["z"], inference=inf)

    def test_ep_requires_probit(self):
        with pytest.raises(ValueError, match="probit"):
            GP(["x"], ["z"], inference="ep")          # gaussian default
        with pytest.raises(ValueError, match="probit"):
            GP(["x"], ["z"], inference="Expectation propagation",
               likelihood="logistic")
        GP(["x"], ["z"], inference="ep", likelihood="probit")  # constructs

    def test_unknown_inference_raises_value_error(self):
        with pytest.raises(ValueError, match="not recognized"):
            GP(["x"], ["z"], inference="Monte Carlo")

    def test_set_training_data_after_setup_warns(self):
        X = np.linspace(0, 1, 8)[:, None]
        gp = GP(["x"], ["y"])
        gp.set_training_data(X, X[:, 0])
        gp.setup()
        with pytest.warns(UserWarning, match="fit_model"):
            gp.set_training_data(X, X[:, 0] * 2)


import jax


class TestFloat32Robustness:
    def test_gp_posterior_finite_in_f32_with_tiny_noise(self):
        # regression: sigma_n=1e-4 (variance 1e-8) made the f32 gram Cholesky
        # NaN before the dtype-aware jitter floor (examples/05 SMPC was broken)
        from hilo_mpc_tpu import GP
        rng = np.random.default_rng(0)
        X = rng.uniform(-1.5, 1.5, (30, 1))
        y = -0.08 * np.tanh(3.0 * X[:, 0]) + 0.01 * rng.standard_normal(30)
        with jax.enable_x64(False):
            gp = GP(["v"], ["d"], noise_variance=1e-4)
            gp.set_training_data(X.T, y[None])
            gp.setup()
            mu, var = gp.predict(np.array([[0.5]]).T)
            assert np.isfinite(np.asarray(mu)).all()
            assert np.isfinite(np.asarray(var)).all()
            # posterior must actually interpolate the data, not just be finite
            mu_t, _ = gp.predict(X.T)
            assert float(np.mean((np.asarray(mu_t).ravel() - y) ** 2)) < 1e-3

    def test_nmpc_default_tol_follows_dtype(self):
        from hilo_mpc_tpu import NMPC
        from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

        def build():
            nmpc = NMPC(cstr_schaffner_and_zeitz())
            nmpc.horizon = 5
            nmpc.quad_stage_cost.add_states(weights=[1.0, 1.0], ref=[0.3, 0.18])
            nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
            nmpc.set_parameters([1.0] * 6)
            nmpc.setup(options={"dt": 0.1})
            return nmpc
        assert build()._ip_opts.tol == 1e-6          # x64 on (conftest)
        with jax.enable_x64(False):
            assert build()._ip_opts.tol == 1e-4
