"""GP mean-function breadth: numeric values, hyperparameter registry, ARD,
error paths, and operator algebra.

Mirrors the coverage areas of the reference's mean test matrix
(reference: tests/test_means.py — 50 tests over Zero/One/Constant/
Linear/Polynomial numeric calls, fixed flags, ARD dimension mismatches,
hyperprior type errors, and Sum/Scale/Product/Power multi-op algebra).
All evaluations are closed-form hand-computed values. Pure CPU, no
solver jits — this file is cheap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu.ml.gp.means import (ConstantMean, LinearMean, MeanPower,
                                      MeanProduct, MeanScale, MeanSum,
                                      OneMean, PolynomialMean, ZeroMean)
from hilo_mpc_tpu.ml.hyperparameters import Hyperparameter
from hilo_mpc_tpu.ml.priors import GaussianPrior

X3 = np.array([[1.0, 2.0, 3.0], [0.5, -1.0, 2.0]])


# -- Zero / One / Constant ------------------------------------------------------
def test_zero_mean_value():
    np.testing.assert_allclose(ZeroMean()(X3), np.zeros(2))


def test_zero_mean_has_no_hyperparameters():
    assert ZeroMean().hyperparameters == []


def test_one_mean_value():
    np.testing.assert_allclose(OneMean()(X3), np.ones(2))


def test_one_mean_has_no_hyperparameters():
    assert OneMean().hyperparameters == []


def test_constant_mean_value():
    np.testing.assert_allclose(ConstantMean(bias=2.5)(X3), [2.5, 2.5])


def test_constant_mean_hyperparameter_name():
    (hp,) = ConstantMean(bias=3.0).hyperparameters
    assert hp.name == "const.bias"
    np.testing.assert_allclose(hp.value, [3.0])
    assert not hp.fixed


def test_constant_mean_fixed_flag():
    m = ConstantMean(bias=3.0)
    m.bias.fixed = True
    assert m.hyperparameters[0].fixed


def test_constant_mean_negative_bias_allowed():
    # bias is a free (not positivity-constrained) parameter
    np.testing.assert_allclose(ConstantMean(bias=-1.5)(X3), [-1.5, -1.5])


# -- Linear ----------------------------------------------------------------------
def test_linear_mean_scalar_coefficient():
    # sum(c * x) with scalar c broadcast over dims
    np.testing.assert_allclose(LinearMean(coefficient=2.0)(X3),
                               [2 * 6.0, 2 * 1.5])


def test_linear_mean_ard_coefficients():
    m = LinearMean(coefficient=[1.0, 0.0, -1.0])
    np.testing.assert_allclose(m(X3), [1 - 3, 0.5 - 2])


def test_linear_mean_ard_dimension_mismatch_raises():
    m = LinearMean(coefficient=[1.0, 2.0])
    with pytest.raises(ValueError, match="ARD"):
        m(X3)


def test_linear_mean_active_dims():
    m = LinearMean(coefficient=[1.0, 1.0], active_dims=[0, 2])
    np.testing.assert_allclose(m(X3), [4.0, 2.5])


def test_linear_mean_active_dims_scalar_coefficient():
    m = LinearMean(coefficient=3.0, active_dims=[1])
    np.testing.assert_allclose(m(X3), [6.0, -3.0])


def test_linear_mean_1d_input_promoted():
    # a 1-d X is interpreted as a column of scalar samples
    np.testing.assert_allclose(LinearMean(coefficient=2.0)(np.array([1., 2.])),
                               [2.0, 4.0])


def test_linear_mean_hyperparameter_registry():
    (hp,) = LinearMean(coefficient=[1.0, 2.0, 3.0]).hyperparameters
    assert hp.name == "lin.coefficient"
    assert hp.size == 3


# -- Polynomial --------------------------------------------------------------------
def test_polynomial_mean_degree_two():
    # (sum(c x) + off)^2 = (6 + 1)^2 / (1.5 + 1)^2
    m = PolynomialMean(degree=2, coefficient=1.0, offset=1.0)
    np.testing.assert_allclose(m(X3), [49.0, 6.25])


def test_polynomial_mean_degree_one_equals_linear_plus_offset():
    m = PolynomialMean(degree=1, coefficient=2.0, offset=0.5)
    lin = LinearMean(coefficient=2.0)
    np.testing.assert_allclose(m(X3), np.asarray(lin(X3)) + 0.5)


def test_polynomial_mean_ard():
    m = PolynomialMean(degree=3, coefficient=[1.0, 1.0, 0.0], offset=0.0)
    np.testing.assert_allclose(m(X3), [27.0, -0.125])


def test_polynomial_mean_invalid_degree_raises():
    with pytest.raises(ValueError, match="degree"):
        PolynomialMean(degree=0)


def test_polynomial_mean_ard_dimension_mismatch_raises():
    m = PolynomialMean(degree=2, coefficient=[1.0, 2.0])
    with pytest.raises(ValueError, match="ARD"):
        m(X3)


def test_polynomial_mean_hyperparameters():
    names = {hp.name for hp in PolynomialMean(degree=2).hyperparameters}
    assert names == {"poly.coefficient", "poly.offset"}


# -- hyperprior validation ----------------------------------------------------------
def test_hyperparameter_accepts_prior_distribution():
    hp = Hyperparameter("h", value=1.0, prior=GaussianPrior(0.0, 1.0))
    assert np.isfinite(hp.log_prior(0.5))


def test_hyperparameter_rejects_non_prior():
    # reference parity: hyperprior must be a Prior distribution
    # (tests/test_means.py polynomial/linear 'hyperprior_wrong_type')
    with pytest.raises(TypeError, match="Prior"):
        Hyperparameter("h", value=1.0, prior="gaussian")


def test_positive_hyperparameter_rejects_nonpositive():
    with pytest.raises(ValueError, match="> 0"):
        Hyperparameter("h", value=-1.0, positive=True)


# -- operator algebra -----------------------------------------------------------------
def test_mean_sum():
    m = ConstantMean(bias=1.0) + LinearMean(coefficient=1.0)
    assert isinstance(m, MeanSum)
    np.testing.assert_allclose(m(X3), [7.0, 2.5])


def test_mean_sum_with_scalar():
    m = LinearMean(coefficient=1.0) + 2.0
    np.testing.assert_allclose(m(X3), [8.0, 3.5])


def test_mean_radd_scalar():
    m = 2.0 + LinearMean(coefficient=1.0)
    np.testing.assert_allclose(m(X3), [8.0, 3.5])


def test_mean_scale():
    m = LinearMean(coefficient=1.0) * 3.0
    assert isinstance(m, MeanScale)
    np.testing.assert_allclose(m(X3), [18.0, 4.5])


def test_mean_scale_from_the_right():
    m = 3.0 * LinearMean(coefficient=1.0)
    np.testing.assert_allclose(m(X3), [18.0, 4.5])


def test_mean_product():
    m = ConstantMean(bias=2.0) * LinearMean(coefficient=1.0)
    assert isinstance(m, MeanProduct)
    np.testing.assert_allclose(m(X3), [12.0, 3.0])


def test_mean_power():
    m = LinearMean(coefficient=1.0) ** 2
    assert isinstance(m, MeanPower)
    np.testing.assert_allclose(m(X3), [36.0, 2.25])


def test_mean_multi_op_sum_power():
    # (c + lin)^2 evaluated by composition
    m = (ConstantMean(bias=1.0) + LinearMean(coefficient=1.0)) ** 2
    np.testing.assert_allclose(m(X3), [49.0, 6.25])


def test_mean_multi_op_sum_of_products():
    m = (ConstantMean(bias=2.0) * LinearMean(coefficient=1.0)
         + OneMean() * ConstantMean(bias=-1.0))
    np.testing.assert_allclose(m(X3), [11.0, 2.0])


def test_mean_multi_op_scale_of_sum():
    m = 0.5 * (LinearMean(coefficient=1.0) + ConstantMean(bias=4.0))
    np.testing.assert_allclose(m(X3), [5.0, 2.75])


def test_operator_collects_hyperparameters_without_duplicates():
    lin = LinearMean(coefficient=1.0)
    m = lin + lin  # same object on both sides: its hp must appear once
    assert len(m.hyperparameters) == 1
    m2 = lin * ConstantMean(bias=1.0)
    assert len(m2.hyperparameters) == 2


def test_composite_mean_is_jit_traceable():
    m = (ConstantMean(bias=1.0) + LinearMean(coefficient=[1.0, 0.0, 1.0])) ** 2
    params = m.param_values()
    f = jax.jit(lambda x: m.eval(params, x))
    np.testing.assert_allclose(f(jnp.asarray(X3[0])), 25.0, rtol=1e-12)


# -- same-family composition must not alias hyperparameters (regression) ---------
def test_same_family_means_do_not_alias():
    # two ConstantMeans in one composite: before hp.key, the shared params
    # dict was keyed by name and the second 'const.bias' silently overwrote
    # the first
    m = ConstantMean(bias=2.0) + ConstantMean(bias=-1.0)
    np.testing.assert_allclose(m(X3), [1.0, 1.0])
    assert len(m.hyperparameters) == 2


def test_same_family_kernels_do_not_alias():
    from hilo_mpc_tpu.ml.gp.kernels import SquaredExponentialKernel as SE

    k1, k2 = SE(length_scales=0.5), SE(length_scales=3.0)
    ks = k1 + k2
    X = np.linspace(0.0, 2.0, 5)[:, None]
    np.testing.assert_allclose(np.asarray(ks(X)),
                               np.asarray(k1(X)) + np.asarray(k2(X)),
                               rtol=1e-12)
    # and the composite's params dict carries all four entries
    assert len({hp.key for hp in ks.hyperparameters}) == 4
