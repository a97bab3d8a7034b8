"""LQR validation/behavior parity with the reference's test_LQR.py (24 tests):
vector Q/R set the diagonal, complex/asymmetric/indefinite rejection,
not-set-up and missing-matrix errors, parameter-dependent gains."""
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import LQR, Model


def param_model():
    # reference: test_LQR.py:240-257 — x+ = x + 2y + p*u ; y+ = y - x ; z+ = z + w
    m = Model(name="plqr", discrete=True)
    m.set_dynamical_states(["x", "y", "z"])
    m.set_inputs(["u", "w"])
    m.set_parameters("p")
    m.set_dynamical_equations(
        lambda x, u, p: jnp.array([x[0] + 2 * x[1] + p[0] * u[0],
                                   x[1] - x[0], x[2] + u[1]]))
    m.setup(dt=1.0)
    return m


def _lqr():
    lqr = LQR(param_model())
    lqr.horizon = 5
    return lqr


class TestMatrixSetters:
    def test_vector_sets_diagonal(self):
        lqr = _lqr()
        lqr.Q = [1, 2, 3]
        np.testing.assert_allclose(lqr.Q, np.diag([1.0, 2.0, 3.0]))

    def test_complex_rejected(self):
        lqr = _lqr()
        with pytest.raises(ValueError, match="real"):
            lqr.Q = np.eye(3) * (1 + 1j)

    def test_not_symmetric_rejected(self):
        lqr = _lqr()
        with pytest.raises(ValueError, match="symmetric"):
            lqr.Q = np.array([[1.0, 2.0, 0], [0, 1.0, 0], [0, 0, 1.0]])

    def test_not_psd_rejected(self):
        lqr = _lqr()
        with pytest.raises(ValueError, match="positive"):
            lqr.Q = np.diag([1.0, -1.0, 1.0])

    def test_r_not_pd_rejected(self):
        lqr = _lqr()
        with pytest.raises(ValueError, match="positive definite"):
            lqr.R = np.diag([1.0, 0.0])

    def test_dimension_mismatch(self):
        lqr = _lqr()
        with pytest.raises(ValueError, match="shape"):
            lqr.Q = np.eye(2)
        with pytest.raises(ValueError, match="shape"):
            lqr.R = np.eye(3)


class TestCallErrors:
    def test_not_set_up(self):
        with pytest.raises(RuntimeError, match="not set up"):
            _lqr().call()

    def test_no_q_matrix(self):
        lqr = _lqr()
        lqr.setup()
        with pytest.raises(RuntimeError, match="Matrix Q"):
            lqr.call()

    def test_no_r_matrix(self):
        lqr = _lqr()
        lqr.setup()
        lqr.Q = [1, 1, 1]
        with pytest.raises(RuntimeError, match="Matrix R"):
            lqr.call()

    def test_no_x_supplied(self):
        lqr = _lqr()
        lqr.setup()
        lqr.Q = [1, 1, 1]
        lqr.R = [1, 1]
        with pytest.raises(ValueError, match="state information"):
            lqr.call()

    def test_nonlinear_model_rejected(self):
        m = Model(name="nl", discrete=True)
        m.set_dynamical_states("x")
        m.set_inputs("u")
        m.set_dynamical_equations(lambda x, u: jnp.atleast_1d(x[0] ** 2 + u[0]))
        m.setup(dt=1.0)
        with pytest.raises(ValueError, match="linear"):
            LQR(m)


class TestParameterDependentGain:
    """Reference pins K for this model at p=0 (default) and p=1
    (tests/test_LQR.py:314-356)."""

    def test_k_matrix_no_p(self):
        lqr = _lqr()
        lqr.setup()
        lqr.Q = [1, 1, 1]
        lqr.R = [1, 1]
        lqr.call(x=[1, 0, 1])
        # p defaults to 0: input u has no authority, its gain row is zero
        np.testing.assert_allclose(
            lqr.K, np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.61802575]]),
            atol=2e-6)

    def test_k_matrix_with_p(self):
        lqr = _lqr()
        lqr.setup()
        lqr.Q = [1, 1, 1]
        lqr.R = [1, 1]
        lqr.call(x=[1, 0, 1], p=1)
        np.testing.assert_allclose(
            lqr.K, np.array([[1.39207671, 1.35221712, 0.0],
                             [0.0, 0.0, 0.61802575]]), atol=2e-6)

    def test_k_none_before_gain(self):
        lqr = _lqr()
        lqr.setup()
        assert lqr.K is None
