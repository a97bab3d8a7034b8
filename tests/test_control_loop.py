"""SimpleControlLoop + LMPC + LQR + PID integration tests (reference tier (c):
closed-loop smoke/convergence, e.g. tests/test_NMPC.py:58-139)."""
import numpy as np
import pytest

from hilo_mpc_tpu import LMPC, LQR, NMPC, PID, SimpleControlLoop, Model
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz


def double_integrator(discrete=True, dt=0.1):
    m = Model(discrete=discrete)
    if discrete:
        m.set_state_space(A=[[1.0, dt], [0.0, 1.0]], B=[[0.5 * dt ** 2], [dt]],
                          C=[[1.0, 0.0]])
    else:
        m.set_state_space(A=[[0.0, 1.0], [0.0, 0.0]], B=[[0.0], [1.0]],
                          C=[[1.0, 0.0]])
    return m


class TestLMPC:
    def test_requires_linear(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x ** 3)
        with pytest.raises(ValueError, match="linear"):
            LMPC(m)

    def test_weight_validation(self):
        lmpc = LMPC(double_integrator())
        with pytest.raises(ValueError):
            lmpc.R = np.zeros((1, 1))  # not PD
        with pytest.raises(ValueError):
            lmpc.Q = [[1.0, 2.0], [0.0, 1.0]]  # not symmetric

    def test_regulates_to_origin(self):
        plant = double_integrator()
        plant.setup(dt=0.1)
        plant.set_initial_conditions([1.0, 0.0])
        lmpc = LMPC(double_integrator())
        lmpc.horizon = 20
        lmpc.Q = np.diag([5.0, 1.0])
        lmpc.R = 0.1
        lmpc.set_box_constraints(u_lb=-2.0, u_ub=2.0)
        lmpc.setup(options={"dt": 0.1})
        loop = SimpleControlLoop(plant, lmpc)
        loop.run(40)
        x_final = plant.solution["x:f"]
        assert np.linalg.norm(x_final) < 5e-2
        assert np.max(np.abs(loop.solution["u"])) <= 2.0 + 1e-6

    def test_matches_lqr_when_unconstrained(self):
        # without active constraints, receding-horizon LMPC with terminal P = DARE
        # solution equals the infinite-horizon LQR feedback law
        lqr = LQR(double_integrator())
        lqr.horizon = None
        lqr.Q = np.diag([5.0, 1.0])
        lqr.R = np.array([[0.1]])
        lqr.setup()
        lmpc = LMPC(double_integrator())
        lmpc.horizon = 15
        lmpc.Q = np.diag([5.0, 1.0])
        lmpc.R = np.array([[0.1]])
        lmpc.P = lqr._P
        lmpc.setup(options={"dt": 0.1, "tol": 1e-10})
        x0 = np.array([1.0, -0.5])
        u_mpc = lmpc.optimize(x0)
        u_lqr = lqr.call(x0)
        np.testing.assert_allclose(u_mpc, u_lqr, atol=1e-6)


class TestLQRPID:
    def test_lqr_psd_checks(self):
        lqr = LQR(double_integrator())
        with pytest.raises(ValueError):
            lqr.Q = [[1.0, 0.0], [0.0, -1.0]]

    def test_lqr_requires_linear(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x ** 2)
        with pytest.raises(ValueError):
            LQR(m)

    def test_lqr_closed_loop_stable(self):
        plant = double_integrator()
        plant.setup(dt=0.1)
        plant.set_initial_conditions([1.0, 0.0])
        lqr = LQR(double_integrator())
        lqr.horizon = 30
        lqr.Q = np.eye(2)
        lqr.R = np.eye(1) * 0.1
        lqr.setup()
        loop = SimpleControlLoop(plant, lqr)
        loop.run(60)
        assert np.linalg.norm(plant.solution["x:f"]) < 1e-2

    def test_pid_velocity_form(self):
        # velocity form with windowed setpoints (reference keeps a 3-sample sp
        # history): the setpoint step kicks once, then output holds while the
        # error is constant
        pid = PID(k_p=2.0, t_i=np.inf, t_d=0.0)
        pid.setup(dt=0.1)
        pid.set_point = [1.0]
        u1 = pid.call([0.0])          # sp stepped 0 -> 1: du = kp * 1
        np.testing.assert_allclose(u1, [2.0])
        u2 = pid.call([0.0])          # error unchanged: output held
        np.testing.assert_allclose(u2, [2.0])
        u3 = pid.call([-1.0])         # error 1 -> 2: another kp * 1
        np.testing.assert_allclose(u3, [4.0])

    def test_pid_integral_action_removes_offset(self):
        # first-order plant x+ = x + dt*(-x + u) controlled by PI
        plant = Model(discrete=True)
        plant.set_dynamical_states("x")
        plant.set_inputs("u")
        plant.set_dynamical_equations(lambda x, u: x + 0.1 * (-x + u[0]))
        plant.setup(dt=0.1)
        plant.set_initial_conditions([0.0])
        pid = PID(k_p=1.0, t_i=0.5)
        pid.setup(dt=0.1)
        pid.set_point = [2.0]
        x = np.array([0.0])
        for _ in range(300):
            u = pid.call(x)
            x = plant.simulate(u=u, steps=1)["x"][-1]
        np.testing.assert_allclose(x, [2.0], atol=1e-2)

    def test_pid_diagonal_validation(self):
        with pytest.raises(ValueError, match="diagonal"):
            PID(n_set_points=2, k_p=[[1.0, 0.5], [0.0, 1.0]])

    def test_pid_output_limits(self):
        pid = PID(k_p=100.0)
        pid.set_output_limits(-1.0, 1.0)
        pid.setup(dt=0.1)
        pid.set_point = [10.0]
        u = pid.call([0.0])
        assert abs(u[0]) <= 1.0


class TestLoop:
    def test_nmpc_with_ekf_observer(self):
        from hilo_mpc_tpu import EKF

        CSTR_P = [1.0] * 6
        plant = cstr_schaffner_and_zeitz()
        plant.setup(dt=0.1, integration_method="rk4")
        plant.set_initial_conditions([0.2, 0.1])
        plant.set_initial_parameter_values(CSTR_P)

        nmpc = NMPC(cstr_schaffner_and_zeitz())
        nmpc.horizon = 10
        nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0],
                                        ref=[0.3, 0.18055])
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.set_parameters(CSTR_P)
        nmpc.setup(options={"dt": 0.1})

        ekf = EKF(cstr_schaffner_and_zeitz())
        ekf.Q = 1e-6
        ekf.R = 1e-5
        ekf.set_initial_parameter_values(CSTR_P)
        ekf.setup(dt=0.1)
        ekf.set_initial_guess([0.2, 0.1], P0=np.eye(2) * 0.01)

        loop = SimpleControlLoop(plant, nmpc, ekf)
        loop.run(20)
        x_final = plant.solution["x:f"]
        assert np.linalg.norm(x_final - [0.3, 0.18055]) < 1e-2

    def test_loop_requires_setup_plant(self):
        plant = cstr_schaffner_and_zeitz()
        with pytest.raises(RuntimeError, match="set up"):
            SimpleControlLoop(plant, lambda x: np.zeros(1))

    def test_callable_controller(self):
        plant = double_integrator()
        plant.setup(dt=0.1)
        plant.set_initial_conditions([1.0, 0.0])
        K = np.array([[2.0, 2.1]])
        loop = SimpleControlLoop(plant, lambda x: -(K @ x))
        loop.run(80)
        assert np.linalg.norm(plant.solution["x:f"]) < 5e-2


class TestMoreControllers:
    def test_ann_object_as_controller(self):
        from hilo_mpc_tpu import ANN, Dense

        plant = double_integrator()
        plant.setup(dt=0.1)
        plant.set_initial_conditions([1.0, 0.0])
        # teach a stabilizing linear policy u = -K x to an ANN
        rng = np.random.default_rng(0)
        K = np.array([2.0, 2.1])
        X = rng.uniform(-2, 2, size=(600, 2))
        ann = ANN(["pos", "vel"], ["u"])
        ann.add_layers(Dense(16, activation="tanh"))
        ann.train(batch_size=64, epochs=250, X=X, y=-(X @ K), patience=100)
        loop = SimpleControlLoop(plant, ann)
        loop.run(80)
        assert np.linalg.norm(plant.solution["x:f"]) < 0.1

    def test_model_generate_data(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_inputs("u")
        m.set_dynamical_equations(lambda x, u: -x + u)
        m.setup(dt=0.1, integration_method="rk4")
        m.set_initial_conditions([0.0])
        ds = m.generate_data(kind="random_uniform", steps=30, lb=-1.0, ub=1.0,
                             seed=0)
        assert ds.n_samples == 30
        assert ds.features == ["x", "u"]
