"""Expectation-propagation GP classification (GPML alg. 3.5/3.6).

The reference declares EP inference but stubs it (reference: hilo_mpc/
modules/machine_learning/gp/inference.py:233-239); ours is implemented
(parallel EP with damping, probit likelihood). Correctness pins:

- the EP log marginal likelihood matches a brute-force 2-D quadrature of
  Z = iint N(f|m,K) Phi(y1 f1) Phi(y2 f2) df (EP is near-exact for probit),
- EP and Laplace agree on the decision function of a toy problem (EP is
  the sharper approximation; probabilities within a loose band),
- probit predict_proba uses the EXACT predictive integral Phi(mu/sqrt(1+v)).
"""
import numpy as np
import pytest

from hilo_mpc_tpu import GP


def _clusters(n=16, seed=1):
    rng = np.random.default_rng(seed)
    X = np.concatenate([rng.normal(-1.2, 0.3, n // 2),
                        rng.normal(1.2, 0.3, n // 2)])[:, None]
    y = np.concatenate([-np.ones(n // 2), np.ones(n // 2)])
    return X, y


class TestEPLogMarginalLikelihoodOracle:
    @pytest.mark.parametrize("y_pair", [(1.0, 1.0), (1.0, -1.0), (-1.0, -1.0)])
    def test_matches_2d_quadrature(self, y_pair):
        from scipy.stats import norm

        X = np.array([[-0.5], [0.7]])
        y = np.array(y_pair)
        gp = GP(["x"], ["c"], likelihood="probit", inference="ep")
        gp.set_training_data(X, y)
        gp.setup()
        lml_ep = gp.log_marginal_likelihood

        # brute-force Z on a dense grid (kernel defaults: SE, variance 1)
        params = gp._params()
        import jax.numpy as jnp

        K = np.asarray(gp.kernel.gram(params, jnp.asarray(X)), dtype=float)
        K = K + 1e-10 * np.mean(np.diag(K)) * np.eye(2)
        g = np.linspace(-6.0, 6.0, 401)
        F1, F2 = np.meshgrid(g, g, indexing="ij")
        pts = np.stack([F1.ravel(), F2.ravel()], axis=1)
        Kinv = np.linalg.inv(K)
        logN = (-0.5 * np.einsum("ni,ij,nj->n", pts, Kinv, pts)
                - 0.5 * np.log((2 * np.pi) ** 2 * np.linalg.det(K)))
        lik = (norm.logcdf(y[0] * pts[:, 0]) + norm.logcdf(y[1] * pts[:, 1]))
        h = g[1] - g[0]
        Z = np.sum(np.exp(logN + lik)) * h * h
        assert lml_ep == pytest.approx(np.log(Z), abs=5e-3)


class TestEPClassification:
    def test_separates_clusters(self):
        X, y = _clusters()
        gp = GP(["x"], ["c"], likelihood="probit", inference="ep")
        gp.set_training_data(X, y)
        gp.setup()
        p = gp.predict_proba(np.array([[-1.2], [0.0], [1.2]]))
        assert p[0] < 0.2 and p[2] > 0.8
        assert 0.25 < p[1] < 0.75
        mu, _ = gp.predict(X)
        assert (np.sign(mu) == y).mean() >= 0.95

    def test_ep_and_laplace_agree(self):
        X, y = _clusters(n=20, seed=3)
        ep = GP(["x"], ["c"], likelihood="probit", inference="ep")
        ep.set_training_data(X, y)
        ep.setup()
        lap = GP(["x"], ["c"], likelihood="probit", inference="laplace")
        lap.set_training_data(X, y)
        lap.setup()
        Xq = np.linspace(-2, 2, 11)[:, None]
        p_ep = ep.predict_proba(Xq)
        p_lap = lap.predict_proba(Xq)
        # same decisions; EP is the sharper approximation, so only a loose
        # band on the probabilities themselves
        assert np.all((p_ep > 0.5) == (p_lap > 0.5))
        assert np.max(np.abs(p_ep - p_lap)) < 0.2

    def test_fit_improves_marginal_likelihood(self):
        X, y = _clusters(n=20, seed=5)
        gp = GP(["x"], ["c"], likelihood="probit", inference="ep")
        gp.set_training_data(X, y)
        gp.setup()
        lml0 = gp.log_marginal_likelihood
        gp.fit_model(max_iter=30)
        assert gp.log_marginal_likelihood >= lml0 - 1e-9
        assert np.isfinite(gp.log_marginal_likelihood)

    def test_zero_one_labels_and_noise_fixed(self):
        X, y = _clusters()
        gp = GP(["x"], ["c"], likelihood="probit", inference="ep")
        gp.set_training_data(X, (y + 1) / 2)
        assert set(np.unique(gp.y_train)) == {-1.0, 1.0}
        assert gp.noise_variance.fixed
        gp.setup()
        assert gp.predict_proba([[1.2]])[0] > 0.8

    def test_predict_fn_jits_and_vmaps(self):
        import jax
        import jax.numpy as jnp

        X, y = _clusters()
        gp = GP(["x"], ["c"], likelihood="probit", inference="ep")
        gp.set_training_data(X, y)
        gp.setup()
        fn = gp.predict_fn()
        mu, var = jax.jit(jax.vmap(fn))(jnp.linspace(-2, 2, 7)[:, None])
        assert mu.shape == (7,) and var.shape == (7,)
        assert bool(jnp.all(var > 0))


class TestLaplaceProbit:
    def test_probit_works_under_laplace_too(self):
        # probit is log-concave, so it is also a valid Laplace likelihood
        X, y = _clusters(n=12, seed=9)
        gp = GP(["x"], ["c"], likelihood="probit", inference="laplace")
        gp.set_training_data(X, y)
        gp.setup()
        p = gp.predict_proba(np.array([[-1.2], [1.2]]))
        assert p[0] < 0.3 and p[1] > 0.7
