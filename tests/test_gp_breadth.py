"""GaussianProcess/GPArray breadth: construction, validation, fixed
hyperparameters, prediction semantics, and array behavior.

Mirrors the coverage areas of the reference's GP matrix (reference:
tests/test_GPs.py — 48 tests over feature/label validation, likelihood/
inference factory strings, training-data dimension errors, re-setup
warnings, LML, fixed parameters, predict/quantiles, GPArray). Factory
string contracts and quantile ordering already live in test_ml.py; this
file covers the remaining construction/validation/fixed-parameter
surface. Tiny datasets, few fit iterations — cheap on CPU.
"""
import warnings

import numpy as np
import pytest

from hilo_mpc_tpu import GP, GPArray
from hilo_mpc_tpu.ml.gp.kernels import (Matern52Kernel,
                                        SquaredExponentialKernel)
from hilo_mpc_tpu.ml.gp.means import ConstantMean
from hilo_mpc_tpu.ml.priors import GaussianPrior


def _toy_gp(n=12, d=1, **kw):
    rng = np.random.default_rng(3)
    X = np.linspace(0.0, 3.0, n).reshape(n, 1) if d == 1 else \
        rng.uniform(0, 3, (n, d))
    y = np.sin(X).sum(axis=1) + 0.05 * rng.standard_normal(n)
    gp = GP([f"x{i}" for i in range(d)], "y", **kw)
    gp.set_training_data(X, y)
    return gp, X, y


# -- construction -----------------------------------------------------------------
def test_features_and_labels_accept_plain_strings():
    gp = GP("x", "y")
    assert gp.features == ["x"] and gp.labels == ["y"]


def test_more_than_one_label_raises():
    with pytest.raises(ValueError, match="GPArray"):
        GP(["x"], ["y1", "y2"])


def test_default_kernel_is_se_with_ard_length_scales():
    gp = GP(["a", "b", "c"], "y")
    assert isinstance(gp.kernel, SquaredExponentialKernel)
    assert gp.kernel.length_scales.size == 3


def test_negative_noise_variance_rejected():
    with pytest.raises(ValueError, match="> 0"):
        GP("x", "y", noise_variance=-0.1)


def test_repr_mentions_features_and_sample_count():
    gp, _, _ = _toy_gp(n=7)
    assert "n=7" in repr(gp) and "x0" in repr(gp)


# -- training-data validation --------------------------------------------------------
def test_wrong_feature_dimension_in_x_raises():
    gp = GP(["a", "b"], "y")
    with pytest.raises(ValueError, match="features"):
        gp.set_training_data(np.ones((5, 3)), np.ones(5))


def test_mismatched_label_count_raises():
    gp = GP("x", "y")
    with pytest.raises(ValueError, match="labels"):
        gp.set_training_data(np.ones((5, 1)), np.ones(4))


def test_column_layout_training_data_accepted():
    # the reference stores (d, n) column layout; both orientations work
    gp = GP(["a", "b"], "y")
    gp.set_training_data(np.ones((2, 6)), np.ones(6))
    assert gp.X_train.shape == (6, 2)


def test_setup_without_training_data_raises():
    with pytest.raises(RuntimeError, match="set_training_data"):
        GP("x", "y").setup()


def test_fit_model_without_training_data_raises():
    with pytest.raises(RuntimeError, match="set_training_data"):
        GP("x", "y").fit_model()


def test_is_setup_lifecycle():
    gp, _, _ = _toy_gp()
    assert not gp.is_setup()
    gp.setup()
    assert gp.is_setup()


def test_set_training_data_resets_posterior_cache():
    gp, X, y = _toy_gp()
    gp.setup()
    assert gp._state is not None
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gp.set_training_data(X, y + 1.0)
    assert gp._state is None
    m, _ = gp.predict(X[:1])  # predict refreshes against the NEW data
    np.testing.assert_allclose(m.ravel()[0], y[0] + 1.0, atol=0.2)


# -- log marginal likelihood & priors ----------------------------------------------
def test_lml_is_finite_before_fit():
    gp, _, _ = _toy_gp()
    assert np.isfinite(gp.log_marginal_likelihood)


def test_fit_does_not_decrease_lml():
    gp, _, _ = _toy_gp()
    before = gp.log_marginal_likelihood
    gp.fit_model(max_iter=60)
    assert gp.log_marginal_likelihood >= before - 1e-9


def test_hyperprior_changes_objective():
    gp1, _, _ = _toy_gp()
    gp2, _, _ = _toy_gp()
    gp2.noise_variance.prior = GaussianPrior(mean=0.5, variance=0.01)
    # identical params, but the prior-weighted objective differs
    assert (abs(gp1.log_marginal_likelihood - gp2.log_marginal_likelihood)
            > 1e-6)


# -- fixed hyperparameters ------------------------------------------------------------
def test_fixed_noise_variance_survives_fit():
    gp, _, _ = _toy_gp(noise_variance=0.07)
    gp.noise_variance.fixed = True
    gp.fit_model(max_iter=60)
    np.testing.assert_allclose(gp.noise_variance.value, [0.07])


def test_fixed_kernel_parameter_survives_fit():
    k = SquaredExponentialKernel(length_scales=0.77)
    k.length_scales.fixed = True
    gp, _, _ = _toy_gp(kernel=k)
    gp.fit_model(max_iter=60)
    np.testing.assert_allclose(k.length_scales.value, [0.77])
    # while the free signal variance moved
    assert abs(float(np.squeeze(k.signal_variance.value)) - 1.0) > 1e-4


def test_all_fixed_fit_is_a_posterior_refresh():
    gp, X, y = _toy_gp()
    for hp in gp.hyperparameters:
        hp.fixed = True
    gp.fit_model()
    m, _ = gp.predict(X)
    assert np.all(np.isfinite(m))


# -- prediction semantics ----------------------------------------------------------------
def test_predict_include_noise_adds_noise_variance():
    gp, X, _ = _toy_gp(noise_variance=0.3)
    gp.setup()
    _, v0 = gp.predict(X[:3], include_noise=False)
    _, v1 = gp.predict(X[:3], include_noise=True)
    np.testing.assert_allclose(v1 - v0, 0.3 ** 2, rtol=1e-6)


def test_predict_wrong_dimension_query_raises():
    gp, _, _ = _toy_gp(d=2)
    gp.setup()
    with pytest.raises((ValueError, TypeError)):
        gp.predict(np.ones((4, 3)))


def test_predict_median_quantile_is_posterior_mean():
    gp, X, _ = _toy_gp()
    gp.setup()
    (q50,) = gp.predict_quantiles(X[:4], quantiles=(0.5,))
    m, _ = gp.predict(X[:4], include_noise=True)
    np.testing.assert_allclose(q50, m, rtol=1e-10)


def test_mean_function_shifts_far_field_prediction():
    gp, X, y = _toy_gp(mean=ConstantMean(bias=5.0))
    gp.setup()
    # far from data the posterior reverts to the prior mean
    m, _ = gp.predict(np.array([[40.0]]))
    np.testing.assert_allclose(m.ravel()[0], 5.0, atol=1e-3)


def test_matern_kernel_gp_end_to_end():
    gp, X, y = _toy_gp(kernel=Matern52Kernel(length_scales=1.0),
                       noise_variance=0.05)
    gp.fit_model(max_iter=60)
    m, v = gp.predict(X)
    assert float(np.max(np.abs(m.ravel() - y))) < 0.2
    assert np.all(v >= -1e-12)


def test_unknown_fit_solver_raises():
    gp, _, _ = _toy_gp()
    with pytest.raises(ValueError, match="solver"):
        gp.fit_model(solver="newton")


# -- GPArray ---------------------------------------------------------------------------
def test_gparray_length_and_iteration():
    arr = GPArray(3)
    assert len(arr) == 3
    assert all(g is None for g in arr)


def test_gparray_invalid_size_raises():
    with pytest.raises(ValueError):
        GPArray(0)


def test_gparray_rejects_non_gp_elements():
    arr = GPArray(2)
    with pytest.raises(TypeError, match="GaussianProcess"):
        arr[0] = "not a gp"


def test_gparray_setup_and_independent_fits():
    arr = GPArray(2)
    g0, X, y = _toy_gp(noise_variance=0.05)
    g1 = GP("x0", "z", noise_variance=0.05)
    g1.set_training_data(X, np.cos(X[:, 0]))
    arr[0], arr[1] = g0, g1
    arr.fit_model(max_iter=40)
    m0, _ = arr[0].predict(X[:3])
    m1, _ = arr[1].predict(X[:3])
    assert not np.allclose(m0, m1)  # outputs trained independently
