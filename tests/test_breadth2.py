"""Additional reference-style coverage: PID option variants, GP hyperparameter
recovery, UKF==EKF on linear systems, DSL math-function breadth."""
import numpy as np
import pytest

from hilo_mpc_tpu import EKF, GP, PID, UKF, Model
from hilo_mpc_tpu.ml.gp import Matern52Kernel, SquaredExponentialKernel
from hilo_mpc_tpu.utils.parsing import parse_equations


class TestPIDVariants:
    def _drive(self, pid, pvs, sp=1.0):
        pid.setup(dt=0.1)
        pid.set_point = [sp]
        return [pid.call([pv])[0] for pv in pvs]

    def test_p_on_pv_no_setpoint_kick(self):
        # P-on-PV: a setpoint step alone must not kick the output
        pid_e = PID(k_p=2.0)
        pid_pv = PID(k_p=2.0, proportional_on_process_value=True)
        for pid in (pid_e, pid_pv):
            pid.setup(dt=0.1)
            pid.set_point = [0.0]
            pid.call([0.5])
            pid.call([0.5])
        # setpoint step with pv unchanged
        u_e = pid_e.call([0.5], set_point=[2.0])
        u_pv = pid_pv.call([0.5], set_point=[2.0])
        # error form reacts to the setpoint change; PV form only integrates
        assert abs(u_pv[0]) < abs(u_e[0])

    def test_d_on_pv_ignores_setpoint_step(self):
        pid_e = PID(k_p=1.0, t_d=0.5)
        pid_pv = PID(k_p=1.0, t_d=0.5, derivative_on_process_value=True)
        for pid in (pid_e, pid_pv):
            pid.setup(dt=0.1)
            pid.set_point = [0.0]
            pid.call([0.0])
            pid.call([0.0])
        u_e = pid_e.call([0.0], set_point=[1.0])
        u_pv = pid_pv.call([0.0], set_point=[1.0])
        # derivative kick appears only in the error form
        assert abs(u_pv[0]) < abs(u_e[0])

    def test_multi_loop_independence(self):
        pid = PID(n_set_points=2, k_p=[1.0, 5.0], t_i=[np.inf, np.inf])
        pid.setup(dt=0.1)
        pid.set_point = [1.0, 1.0]
        pid.call([0.0, 0.0])
        u = pid.call([-1.0, -1.0])
        np.testing.assert_allclose(u[1] / u[0], 5.0, atol=1e-9)

    def test_step_fn_matches_call(self):
        import jax.numpy as jnp

        pid = PID(k_p=1.2, t_i=0.8, t_d=0.1)
        pid.setup(dt=0.1)
        pid.set_point = [1.0]
        step = pid.step_fn()
        carry = (jnp.zeros(1), jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                 jnp.zeros(1))
        pvs = [0.0, 0.2, 0.5, 0.7]
        for pv in pvs:
            carry, u_dev = step(carry, jnp.array([pv]), jnp.array([1.0]))
            u_host = pid.call([pv])
            np.testing.assert_allclose(np.asarray(u_dev), u_host, atol=1e-9)


class TestGPRecovery:
    def test_recovers_known_lengthscale(self):
        # sample from a GP with known lengthscale, fit, recover within a factor
        rng = np.random.default_rng(0)
        X = np.linspace(0, 10, 60)[:, None]
        true_ls = 1.5
        k_true = SquaredExponentialKernel(length_scales=true_ls)
        K = np.asarray(k_true(X)) + 1e-8 * np.eye(60)
        y = np.linalg.cholesky(K) @ rng.standard_normal(60)
        gp = GP(["x"], ["y"], noise_variance=1e-4)
        gp.set_training_data(X, y)
        gp.setup()
        gp.fit_model()
        ls = float(np.squeeze(gp.kernel.length_scales.value))
        assert 0.5 * true_ls < ls < 2.0 * true_ls

    def test_fixed_hyperparameter_not_moved(self):
        X = np.linspace(0, 5, 30)[:, None]
        y = np.sin(X[:, 0])
        gp = GP(["x"], ["y"], kernel=Matern52Kernel(signal_variance=2.0))
        gp.kernel.signal_variance.fixed = True
        gp.set_training_data(X, y)
        gp.setup()
        gp.fit_model(max_iter=60)
        np.testing.assert_allclose(
            float(np.squeeze(gp.kernel.signal_variance.value)), 2.0)

    def test_bounded_fit_respects_bounds(self):
        X = np.linspace(0, 5, 30)[:, None]
        y = np.sin(X[:, 0])
        gp = GP(["x"], ["y"])
        gp.kernel.length_scales.bounds = (0.5, 1.0)
        gp.set_training_data(X, y)
        gp.setup()
        gp.fit_model(max_iter=60)
        ls = float(np.squeeze(gp.kernel.length_scales.value))
        assert 0.5 - 1e-6 <= ls <= 1.0 + 1e-6


class TestFilterConsistency:
    def test_ukf_matches_ekf_on_linear_system(self):
        # for linear dynamics both filters are exact -> identical estimates
        def make():
            m = Model()
            m.set_state_space(A=[[0.0, 1.0], [-1.5, -0.4]], B=[[0.0], [1.0]],
                              C=[[1.0, 0.0]])
            return m

        plant = make()
        plant.setup(dt=0.05, integration_method="rk4")
        plant.set_initial_conditions([1.0, 0.0])
        U = 0.1 * np.ones((30, 1))
        out = plant.simulate(u=U, steps=30)
        Y = out["y"]
        ests = []
        for cls in (EKF, UKF):
            est = cls(make())
            est.Q = 1e-6
            est.R = 1e-5
            est.setup(dt=0.05)
            est.set_initial_guess([0.8, 0.1], P0=np.eye(2) * 0.1)
            ests.append(est.estimate(Y, u=U))
        np.testing.assert_allclose(ests[0], ests[1], atol=1e-5)


class TestDSLBreadth:
    @pytest.mark.parametrize("expr,x,expected", [
        ("sqrt(x(t))", 4.0, 2.0),
        ("log(x(t))", np.e, 1.0),
        ("tanh(x(t))", 0.5, np.tanh(0.5)),
        ("abs(x(t) - 3)", 1.0, 2.0),
        ("fmax(x(t), 2)", 1.0, 2.0),
        ("fmin(x(t), 0.5)", 1.0, 0.5),
        ("x(t)**3", 2.0, 8.0),
        ("cos(pi)", 1.0, -1.0),
        ("atan2(x(t), 1)", 1.0, np.pi / 4),
        ("erf(x(t))", 0.5, 0.5204998778),
    ])
    def test_math_functions(self, expr, x, expected):
        import jax.numpy as jnp

        p = parse_equations(f"dx/dt = {expr}")
        val = p.ode(jnp.array([x]), jnp.zeros(0), jnp.zeros(0), jnp.zeros(0),
                    0.0)
        np.testing.assert_allclose(float(val[0]), expected, atol=1e-6)

    def test_nested_aux_chain(self):
        import jax.numpy as jnp

        p = parse_equations("""
        dx/dt = -c2*x(t)
        c2 = 2*c1
        c1 = a + 1
        """)
        val = p.ode(jnp.array([1.0]), jnp.zeros(0), jnp.zeros(0),
                    jnp.array([2.0]), 0.0)
        np.testing.assert_allclose(float(val[0]), -6.0)

    def test_circular_aux_raises(self):
        with pytest.raises(ValueError, match="circular"):
            parse_equations("""
            dx/dt = -c1*x(t)
            c1 = c2 + 1
            c2 = c1 - 1
            """)
