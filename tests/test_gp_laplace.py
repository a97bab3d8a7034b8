"""Laplace approximate inference + non-Gaussian likelihoods (GPML alg. 3.1/3.2).

The reference DECLARES Laplace inference and the Logistic/Student's-t
likelihoods but stubs them (reference: hilo_mpc/modules/machine_learning/gp/
inference.py:224-230, likelihood.py:78-102); ours are implemented
(hilo_mpc_tpu/ml/gp/inference.py, likelihood.py). Correctness pins:

- Gaussian likelihood under Laplace == exact inference (the posterior is
  exactly Gaussian, so the "approximation" is exact) — mean, variance and
  log marginal likelihood agree to solver tolerance.
- Logistic classification separates a 1-D two-cluster toy and its
  probabilities behave (bounded, ordered, ~0.5 far from data).
- Student's-t regression shrugs off an outlier that visibly drags the
  Gaussian-likelihood GP.
"""
import numpy as np
import pytest

from hilo_mpc_tpu import GP


def _toy_regression(n=20, seed=0, noise=0.05):
    rng = np.random.default_rng(seed)
    X = np.linspace(-2.0, 2.0, n)[:, None]
    y = np.sin(1.5 * X[:, 0]) + noise * rng.standard_normal(n)
    return X, y


class TestLaplaceGaussianMatchesExact:
    def test_posterior_and_lml_match(self):
        X, y = _toy_regression()
        Xq = np.linspace(-2.5, 2.5, 15)[:, None]

        exact = GP(["x"], ["y"], noise_variance=0.05)
        exact.set_training_data(X, y)
        exact.setup()
        lap = GP(["x"], ["y"], noise_variance=0.05, inference="laplace")
        lap.set_training_data(X, y)
        lap.setup()

        mu_e, var_e = exact.predict(Xq)
        mu_l, var_l = lap.predict(Xq)
        np.testing.assert_allclose(mu_l, mu_e, atol=1e-6)
        np.testing.assert_allclose(var_l, var_e, atol=1e-6)
        assert lap.log_marginal_likelihood == pytest.approx(
            exact.log_marginal_likelihood, abs=1e-6)

    def test_fit_objective_and_gradient_match_exact(self):
        """The Laplace LML surface (value AND jax gradient through the
        Newton mode search) coincides with the exact marginal likelihood
        for the Gaussian likelihood — checked at the exact GP's FITTED
        hyperparameters and at the initial point. (Fitted endpoints are not
        compared: the surface is multimodal and optimizers may legitimately
        land in different basins from chaotic trajectory divergence.)"""
        import jax
        import jax.numpy as jnp

        X, y = _toy_regression(n=25, seed=3)
        exact = GP(["x"], ["y"], noise_variance=0.3)
        exact.set_training_data(X, y)
        exact.fit_model(max_iter=60)
        lap = GP(["x"], ["y"], noise_variance=0.3, inference="laplace")
        lap.set_training_data(X, y)
        for h_e, h_l in zip(exact.hyperparameters, lap.hyperparameters):
            h_l.value = h_e.value
        assert lap.log_marginal_likelihood == pytest.approx(
            exact.log_marginal_likelihood, abs=1e-6)

        fresh_l = GP(["x"], ["y"], noise_variance=0.3, inference="laplace")
        fresh_l.set_training_data(X, y)
        fresh_e = GP(["x"], ["y"], noise_variance=0.3)
        fresh_e.set_training_data(X, y)
        w0, specs, _ = fresh_l._pack()
        g_l = jax.grad(lambda w: fresh_l._nll(fresh_l._unpack(w, specs)))(
            jnp.asarray(w0))
        w0e, specse, _ = fresh_e._pack()
        g_e = jax.grad(lambda w: fresh_e._nll(fresh_e._unpack(w, specse)))(
            jnp.asarray(w0e))
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(g_e),
                                   atol=1e-6)


class TestLogisticClassification:
    def _data(self):
        rng = np.random.default_rng(1)
        X = np.concatenate([rng.normal(-1.2, 0.3, 20),
                            rng.normal(1.2, 0.3, 20)])[:, None]
        y = np.concatenate([-np.ones(20), np.ones(20)])
        return X, y

    def test_separates_clusters(self):
        X, y = self._data()
        gp = GP(["x"], ["c"], likelihood="logistic", inference="laplace")
        gp.set_training_data(X, y)
        gp.setup()
        p = gp.predict_proba(np.array([[-1.2], [0.0], [1.2]]))
        assert p[0] < 0.2 and p[2] > 0.8
        assert 0.25 < p[1] < 0.75          # undecided at the boundary
        assert np.all((p > 0.0) & (p < 1.0))
        # latent mean carries the class sign on the training points
        mu, _ = gp.predict(X)
        assert (np.sign(mu) == y).mean() >= 0.95

    def test_zero_one_labels_accepted(self):
        X, y = self._data()
        gp = GP(["x"], ["c"], likelihood="logistic", inference="laplace")
        gp.set_training_data(X, (y + 1) / 2)   # {0, 1}
        assert set(np.unique(gp.y_train)) == {-1.0, 1.0}
        gp.setup()
        assert gp.predict_proba([[1.2]])[0] > 0.8

    def test_bad_labels_rejected_and_noise_fixed(self):
        gp = GP(["x"], ["c"], likelihood="logistic", inference="laplace")
        with pytest.raises(ValueError, match="binary labels"):
            gp.set_training_data(np.zeros((3, 1)), np.array([0.0, 0.5, 1.0]))
        assert gp.noise_variance.fixed   # no observation-noise parameter

    def test_fit_improves_marginal_likelihood(self):
        X, y = self._data()
        gp = GP(["x"], ["c"], likelihood="logistic", inference="laplace")
        gp.set_training_data(X, y)
        gp.setup()
        lml0 = gp.log_marginal_likelihood
        gp.fit_model(max_iter=40)
        assert gp.log_marginal_likelihood >= lml0 - 1e-9
        assert np.isfinite(gp.log_marginal_likelihood)

    def test_predict_proba_requires_logistic(self):
        X, y = _toy_regression(n=8)
        gp = GP(["x"], ["y"])
        gp.set_training_data(X, y)
        gp.setup()
        with pytest.raises(RuntimeError, match="logistic"):
            gp.predict_proba(X)


class TestStudentsTRobustness:
    def test_outlier_resistance_vs_gaussian(self):
        rng = np.random.default_rng(7)
        X = np.linspace(-2.0, 2.0, 25)[:, None]
        y = np.sin(1.5 * X[:, 0]) + 0.03 * rng.standard_normal(25)
        y_dirty = y.copy()
        y_dirty[12] += 4.0                  # gross outlier at x ~ 0

        g = GP(["x"], ["y"], noise_variance=0.1)
        g.set_training_data(X, y_dirty)
        g.setup()
        t = GP(["x"], ["y"], noise_variance=0.1, likelihood="Students t",
               inference="laplace")
        t.set_training_data(X, y_dirty)
        t.setup()

        xq = X[12:13]
        clean = np.sin(1.5 * xq[:, 0])
        err_g = abs(float(g.predict(xq)[0][0] - clean[0]))
        err_t = abs(float(t.predict(xq)[0][0] - clean[0]))
        # the heavy-tailed likelihood must discount the outlier markedly
        assert err_t < 0.5 * err_g
        assert err_t < 0.35

    def test_df_validation(self):
        from hilo_mpc_tpu.ml.gp.likelihood import StudentsT

        with pytest.raises(ValueError, match="degrees of freedom"):
            StudentsT(df=0.5)


class TestSMPCIntegration:
    def test_students_t_gp_drives_smpc(self):
        """A Laplace/Student's-t GP exposes the same traceable
        predict_fn surface as exact GPs, so it drops straight into the
        SMPC covariance propagation (control/smpc.py) — trained here on
        disturbance data CONTAMINATED with an outlier that would bend a
        Gaussian-likelihood fit."""
        import jax.numpy as jnp

        from hilo_mpc_tpu import Model, SMPC

        m = Model(name="lin")
        m.set_dynamical_states(["x1", "x2"])
        m.set_inputs("u")
        m.set_dynamical_equations(
            lambda x, u: jnp.array([x[1], -0.5 * x[0] - 0.4 * x[1] + u[0]]))

        rng = np.random.default_rng(0)
        X = np.linspace(-1.5, 1.5, 25)[:, None]
        y = 0.05 * np.sin(2 * X[:, 0]) + 0.02 * rng.standard_normal(25)
        y[7] += 1.5                          # gross sensor glitch
        gp = GP(["x1"], ["d"], noise_variance=0.05,
                likelihood="Students t", inference="laplace")
        gp.set_training_data(X, y)
        gp.setup()
        # the robust fit keeps the disturbance estimate near the clean curve
        mu_glitch, _ = gp.predict(X[7:8])
        assert abs(float(mu_glitch[0]) - 0.05 * np.sin(2 * X[7, 0])) < 0.1

        smpc = SMPC(m, gps={"x2": gp}, dt=0.1)
        smpc.horizon = 10
        smpc.quad_stage_cost.add_states(names=["x1", "x2"], weights=[5.0, 1.0])
        smpc.quad_stage_cost.add_inputs(weights=0.1)
        smpc.set_box_constraints(u_lb=-3.0, u_ub=3.0)
        smpc.set_initial_covariance(np.zeros((2, 2)))
        smpc.setup(options={"dt": 0.1})
        smpc.optimize([1.0, 0.0])
        assert smpc.stats["converged"]
        pred = smpc.return_prediction()["x"]
        P22 = pred[:, 2 + 3]
        assert P22[-1] > P22[1] >= 0.0       # variance accumulates


class TestTraceability:
    def test_predict_fn_jits_and_vmaps(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        X = np.concatenate([rng.normal(-1.0, 0.3, 10),
                            rng.normal(1.0, 0.3, 10)])[:, None]
        y = np.concatenate([-np.ones(10), np.ones(10)])
        gp = GP(["x"], ["c"], likelihood="logistic", inference="laplace")
        gp.set_training_data(X, y)
        gp.setup()
        fn = gp.predict_fn()
        mu, var = jax.jit(jax.vmap(fn))(jnp.linspace(-2, 2, 9)[:, None])
        assert mu.shape == (9,) and var.shape == (9,)
        assert bool(jnp.all(var > 0))
