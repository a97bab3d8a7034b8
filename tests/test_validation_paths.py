"""Construction/validation error-path breadth (reference style:
tests/test_KFs.py:8-238 — setters, dimension mismatches, and misuse order are
tested as first-class behavior, not incidentally).

Covers: estimator covariance/guess setters, KF/EKF/UKF construction rules,
PID/LQR setters, Model declaration/lifecycle misuse, NMPC option/cost
validation, mean functions (reference: tests/test_means.py — 50 cases)."""
import numpy as np
import pytest

from hilo_mpc_tpu import (EKF, KF, LQR, NMPC, PID, UKF, Model,
                          SimpleControlLoop)
from hilo_mpc_tpu.ml.gp import (ConstantMean, LinearMean, OneMean,
                                PolynomialMean, ZeroMean)


def linear_model():
    m = Model(discrete=True)
    m.set_state_space(A=np.array([[0.9, 0.1], [0.0, 0.8]]),
                      B=[[0.0], [1.0]], C=[[1.0, 0.0]])
    return m


def pendulum():
    import jax.numpy as jnp

    m = Model(name="pend")
    m.set_dynamical_states(["th", "om"])
    m.set_inputs("tau")
    m.set_measurements(["y_th"])
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) - 0.3 * x[1] + u[0]]))
    m.set_measurement_equations(lambda x: x[:1])
    return m


class TestEstimatorSetters:
    def test_q_wrong_diag_length(self):
        ekf = EKF(pendulum())
        with pytest.raises(ValueError, match="diagonal"):
            ekf.Q = [1.0, 2.0, 3.0]

    def test_q_wrong_matrix_shape(self):
        ekf = EKF(pendulum())
        with pytest.raises(ValueError, match="shape"):
            ekf.Q = np.eye(3)

    def test_q_asymmetric_rejected(self):
        ekf = EKF(pendulum())
        with pytest.raises(ValueError, match="symmetric"):
            ekf.Q = np.array([[1.0, 0.5], [0.0, 1.0]])

    def test_r_wrong_shape(self):
        ekf = EKF(pendulum())
        with pytest.raises(ValueError, match="shape|diagonal"):
            ekf.R = np.eye(2)

    def test_p0_scalar_broadcasts(self):
        ekf = EKF(pendulum())
        ekf.P0 = 0.5
        np.testing.assert_allclose(ekf.P0, 0.5 * np.eye(2))

    def test_q_diag_accepted(self):
        ekf = EKF(pendulum())
        ekf.Q = [0.1, 0.2]
        np.testing.assert_allclose(ekf.Q, np.diag([0.1, 0.2]))

    def test_initial_guess_wrong_size(self):
        ekf = EKF(pendulum())
        with pytest.raises(ValueError, match="entries"):
            ekf.set_initial_guess([1.0, 2.0, 3.0])

    def test_estimate_before_setup(self):
        ekf = EKF(pendulum())
        with pytest.raises(RuntimeError, match="setup"):
            ekf.estimate(y=[0.1], u=[0.0])

    def test_estimate_without_initial_guess(self):
        ekf = EKF(pendulum())
        ekf.setup(dt=0.1)
        with pytest.raises((RuntimeError, ValueError),
                           match="initial_guess|x0"):
            ekf.estimate(y=[0.1], u=[0.0])

    def test_missing_parameters_raise(self):
        import jax.numpy as jnp

        m = Model()
        m.set_dynamical_states(["a"])
        m.set_inputs("u")
        m.set_parameters(["k"])
        m.set_measurements(["y"])
        m.set_dynamical_equations(lambda x, u, p: -p[0] * x + u)
        m.set_measurement_equations(lambda x: jnp.atleast_1d(x[0]))
        ekf = EKF(m)
        ekf.setup(dt=0.1)
        ekf.set_initial_guess([1.0])
        with pytest.raises(ValueError, match="parameters"):
            ekf.estimate(y=[0.1], u=[0.0])


class TestKFConstruction:
    def test_kf_rejects_nonlinear_model(self):
        with pytest.raises(ValueError, match="linear"):
            KF(pendulum())

    def test_kf_accepts_linear_model(self):
        KF(linear_model())

    def test_ekf_accepts_nonlinear(self):
        EKF(pendulum())

    def test_ukf_alpha_range(self):
        for a in (0.0, -0.1, 1.5):
            with pytest.raises(ValueError, match="alpha"):
                UKF(pendulum(), alpha=a)

    def test_ukf_kappa_nonnegative(self):
        with pytest.raises(ValueError, match="kappa"):
            UKF(pendulum(), kappa=-1.0)

    def test_ukf_valid_params(self):
        UKF(pendulum(), alpha=0.5, beta=2.0, kappa=1.0)


class TestPIDValidation:
    def test_multi_loop_requires_diagonal_pairing(self):
        with pytest.raises(ValueError, match="diagonal"):
            PID(n_set_points=2, k_p=np.array([[1.0, 2.0], [3.0, 4.0]]))

    def test_set_point_dimension_mismatch(self):
        pid = PID(n_set_points=2)
        with pytest.raises(ValueError, match="[Dd]imension"):
            pid.set_point = [1.0, 2.0, 3.0]

    def test_call_before_setup(self):
        pid = PID(k_p=1.0)
        with pytest.raises(RuntimeError, match="setup"):
            pid.call([0.5])

    def test_scalar_gains_accepted(self):
        pid = PID(k_p=2.0, t_i=1.5, t_d=0.1)
        pid.setup(dt=0.1)
        out = pid.call(np.array([0.5]))
        assert np.isfinite(np.asarray(out)).all()


class TestLQRValidation:
    def test_requires_linear_model(self):
        with pytest.raises(ValueError, match="linear"):
            LQR(pendulum())

    def test_q_shape(self):
        lqr = LQR(linear_model())
        with pytest.raises(ValueError, match="shape"):
            lqr.Q = np.eye(3)

    def test_q_not_psd(self):
        lqr = LQR(linear_model())
        with pytest.raises(ValueError, match="positive semi-definite"):
            lqr.Q = np.array([[1.0, 0.0], [0.0, -1.0]])

    def test_q_asymmetric(self):
        lqr = LQR(linear_model())
        with pytest.raises(ValueError, match="symmetric"):
            lqr.Q = np.array([[1.0, 0.3], [0.0, 1.0]])

    def test_r_positive_definite_required(self):
        lqr = LQR(linear_model())
        with pytest.raises(ValueError, match="positive definite"):
            lqr.R = np.array([[0.0]])

    def test_horizon_validation(self):
        lqr = LQR(linear_model())
        with pytest.raises(ValueError, match="horizon"):
            lqr.horizon = 0

    def test_call_without_state(self):
        lqr = LQR(linear_model())
        lqr.horizon = 5
        lqr.Q = np.eye(2)
        lqr.R = np.eye(1)
        lqr.setup()
        with pytest.raises(ValueError, match="state"):
            lqr.call(None)

    def test_call_before_setup(self):
        lqr = LQR(linear_model())
        with pytest.raises(RuntimeError):
            lqr.call([1.0, 0.0])


class TestModelLifecycle:
    def test_setup_without_equations(self):
        m = Model()
        m.set_dynamical_states(["a"])
        with pytest.raises(RuntimeError, match="equations"):
            m.setup(dt=0.1)

    def test_simulate_before_setup(self):
        m = pendulum()
        with pytest.raises(RuntimeError, match="setup"):
            m.simulate(u=np.zeros((1, 1)), steps=1)

    def test_initial_conditions_wrong_size(self):
        m = pendulum()
        m.setup(dt=0.1)
        with pytest.raises(ValueError, match="entries"):
            m.set_initial_conditions([1.0, 2.0, 3.0])

    def test_simulate_without_initial_conditions(self):
        m = pendulum()
        m.setup(dt=0.1)
        with pytest.raises(ValueError, match="initial"):
            m.simulate(u=np.zeros((1, 1)), steps=1)

    def test_input_shape_mismatch(self):
        m = pendulum()
        m.setup(dt=0.1)
        m.set_initial_conditions([0.1, 0.0])
        with pytest.raises(ValueError, match="shape"):
            m.simulate(u=np.zeros((3, 2)), steps=3)

    def test_parameter_size_mismatch(self):
        m = pendulum()
        m.setup(dt=0.1)
        with pytest.raises(ValueError, match="entries"):
            m.set_initial_parameter_values([1.0, 2.0])

    def test_negative_vector_dimension(self):
        m = Model()
        with pytest.raises(ValueError, match=">= 0"):
            m.set_dynamical_states(-1)

    def test_discretize_discrete_model_rejected(self):
        m = linear_model()
        with pytest.raises(RuntimeError, match="discrete"):
            m.discretize(0.1)

    def test_equilibrium_point_size_checks(self):
        m = pendulum()
        m.setup(dt=0.1)
        with pytest.raises(ValueError, match="x_eq"):
            m.set_equilibrium_point(x_eq=[0.0], u_eq=[0.0])
        with pytest.raises(ValueError, match="u_eq"):
            m.set_equilibrium_point(x_eq=[0.0, 0.0], u_eq=[0.0, 1.0])


class TestNMPCValidation:
    def test_unknown_option_rejected(self):
        nmpc = NMPC(pendulum())
        nmpc.horizon = 5
        nmpc.quad_stage_cost.add_states(weights=[1.0, 1.0], ref=[0.0, 0.0])
        with pytest.raises(ValueError, match="option"):
            nmpc.setup(options={"dt": 0.1, "integraton_method": "rk4"})

    def test_unknown_cost_state_name(self):
        nmpc = NMPC(pendulum())
        nmpc.horizon = 5
        with pytest.raises(ValueError):
            nmpc.quad_stage_cost.add_states(names=["nope"], weights=1.0,
                                            ref=0.0)

    def test_optimize_before_setup(self):
        nmpc = NMPC(pendulum())
        nmpc.horizon = 5
        with pytest.raises(RuntimeError, match="setup"):
            nmpc.optimize([0.1, 0.0])

    def test_x0_wrong_size(self):
        nmpc = NMPC(pendulum())
        nmpc.horizon = 5
        nmpc.quad_stage_cost.add_states(weights=[1.0, 1.0], ref=[0.0, 0.0])
        nmpc.setup(options={"dt": 0.1})
        with pytest.raises(ValueError, match="entries"):
            nmpc.optimize([0.1, 0.0, 0.3])

    def test_ref_sc_type_checked(self):
        nmpc = NMPC(pendulum())
        nmpc.horizon = 5
        nmpc.quad_stage_cost.add_states(weights=[1.0, 1.0], ref=[0.0, 0.0])
        nmpc.setup(options={"dt": 0.1})
        with pytest.raises(TypeError, match="ref_sc"):
            nmpc.optimize([0.1, 0.0], ref_sc=[0.3])

    def test_horizon_required_before_setup(self):
        nmpc = NMPC(pendulum())
        nmpc.quad_stage_cost.add_states(weights=[1.0, 1.0], ref=[0.0, 0.0])
        with pytest.raises((ValueError, RuntimeError)):
            nmpc.setup(options={"dt": 0.1})


class TestControlLoopValidation:
    def test_plant_must_be_setup(self):
        plant = pendulum()
        with pytest.raises(RuntimeError, match="set up"):
            SimpleControlLoop(plant, lambda x: np.zeros(1))

    def test_run_requires_initial_conditions(self):
        plant = pendulum()
        plant.setup(dt=0.1)
        loop = SimpleControlLoop(plant, lambda x: np.zeros(1))
        with pytest.raises(RuntimeError, match="initial"):
            loop.run(1)

    def test_unsupported_controller_type(self):
        plant = pendulum()
        plant.setup(dt=0.1)
        plant.set_initial_conditions([0.1, 0.0])
        loop = SimpleControlLoop(plant, object())
        with pytest.raises(TypeError, match="controller"):
            loop.run(1)


class TestMeans:
    X = np.array([[0.2, -0.5], [1.0, 0.3], [-0.7, 0.9]])

    def test_zero_mean(self):
        np.testing.assert_allclose(np.asarray(ZeroMean()(self.X)),
                                   np.zeros(3), atol=1e-12)

    def test_one_mean(self):
        np.testing.assert_allclose(np.asarray(OneMean()(self.X)),
                                   np.ones(3), atol=1e-12)

    def test_constant_mean(self):
        np.testing.assert_allclose(np.asarray(ConstantMean(bias=2.5)(self.X)),
                                   2.5 * np.ones(3), atol=1e-12)

    def test_linear_mean(self):
        m = LinearMean(coefficient=[2.0, -1.0])
        np.testing.assert_allclose(np.asarray(m(self.X)),
                                   self.X @ np.array([2.0, -1.0]), atol=1e-9)

    def test_linear_mean_active_dims(self):
        m = LinearMean(coefficient=3.0, active_dims=[1])
        np.testing.assert_allclose(np.asarray(m(self.X)), 3.0 * self.X[:, 1],
                                   atol=1e-9)

    def test_polynomial_mean(self):
        m = PolynomialMean(degree=2, coefficient=[1.0, 1.0], offset=0.5)
        expect = (self.X @ np.ones(2) + 0.5) ** 2
        np.testing.assert_allclose(np.asarray(m(self.X)), expect, atol=1e-9)

    def test_mean_sum(self):
        m = ConstantMean(bias=1.0) + LinearMean(coefficient=[1.0, 0.0])
        np.testing.assert_allclose(np.asarray(m(self.X)),
                                   1.0 + self.X[:, 0], atol=1e-9)

    def test_mean_product(self):
        m = ConstantMean(bias=2.0) * OneMean()
        np.testing.assert_allclose(np.asarray(m(self.X)), 2.0 * np.ones(3),
                                   atol=1e-9)

    def test_mean_scale(self):
        m = 3.0 * OneMean()
        np.testing.assert_allclose(np.asarray(m(self.X)), 3.0 * np.ones(3),
                                   atol=1e-9)

    def test_mean_power(self):
        m = ConstantMean(bias=2.0) ** 2
        np.testing.assert_allclose(np.asarray(m(self.X)), 4.0 * np.ones(3),
                                   atol=1e-9)
