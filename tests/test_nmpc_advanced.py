"""Advanced NMPC features: minimum time, path following (reference tests:
test_NMPC.py test_pf_v2..v12, minimum-time; BASELINE configs[3])."""
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import Model, NMPC


def double_integrator():
    m = Model(name="di")
    m.set_dynamical_states(["pos", "vel"])
    m.set_inputs("a")
    m.set_dynamical_equations(lambda x, u: jnp.array([x[1], u[0]]))
    return m


class TestMinimumTime:
    def test_bang_bang_final_time(self):
        # rest-to-rest transfer over distance 1 with |u|<=1: T* = 2
        nmpc = NMPC(double_integrator())
        nmpc.horizon = 20
        nmpc.set_box_constraints(u_lb=-1.0, u_ub=1.0)
        # lb == ub: routed through the solver's augmented-Lagrangian equality path
        nmpc.add_terminal_constraint(lambda x: x, lb=[0.0, 0.0], ub=[0.0, 0.0],
                                     n=2)
        nmpc.minimize_final_time(weight=1.0, dt_min=0.01, dt_max=1.0)
        nmpc.setup(options={"dt": 0.2, "integration_method": "rk4",
                            "max_iter": 80})
        nmpc.optimize([-1.0, 0.0])
        assert nmpc.stats["converged"], nmpc.stats
        assert abs(nmpc.optimal_final_time - 2.0) < 0.01
        # bang-bang structure: +1 then -1
        U = nmpc.return_prediction()["u"].ravel()
        np.testing.assert_allclose(U[:9], 1.0, atol=1e-4)
        np.testing.assert_allclose(U[-9:], -1.0, atol=1e-4)
        xN = nmpc.return_prediction()["x"][-1]
        np.testing.assert_allclose(xN, [0.0, 0.0], atol=1e-6)

    def test_dt_bounds_respected(self):
        nmpc = NMPC(double_integrator())
        nmpc.horizon = 10
        nmpc.set_box_constraints(u_lb=-1.0, u_ub=1.0)
        nmpc.add_terminal_constraint(lambda x: x[0], lb=-1e-6, ub=1e-6, n=1)
        nmpc.minimize_final_time(weight=1.0, dt_min=0.15, dt_max=0.5)
        nmpc.setup(options={"dt": 0.3, "max_iter": 60})
        nmpc.optimize([-0.1, 0.0])
        assert 0.15 - 1e-6 <= nmpc.optimal_dt <= 0.5 + 1e-6


class TestPathFollowing:
    def test_follows_sine_path(self):
        # kinematic point: x' = u (velocities commanded directly)
        m = Model(name="pt")
        m.set_dynamical_states(["px", "py"])
        m.set_inputs(["vx", "vy"])
        m.set_dynamical_equations(lambda x, u: u)

        nmpc = NMPC(m)
        nmpc.horizon = 12
        path_fn = lambda th: jnp.stack([th, jnp.sin(th)])
        nmpc.quad_stage_cost.add_states(names=["px", "py"], weights=[20.0, 20.0],
                                        path_following=True, path_fn=path_fn)
        nmpc.quad_stage_cost.add_inputs(weights=[0.05, 0.05])
        nmpc.set_box_constraints(u_lb=[-2.0, -2.0], u_ub=[2.0, 2.0])
        nmpc.create_path_variable(u_pf_lb=0.0, u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=1.0)
        nmpc.setup(options={"dt": 0.1})
        assert nmpc._path_following

        x = np.array([0.0, 0.0])
        traj = [x]
        for _ in range(30):
            u = nmpc.optimize(x)
            x = x + 0.1 * u  # exact integration of the kinematic model
            traj.append(x.copy())
        traj = np.asarray(traj)
        # path parameter advanced and the trajectory hugs the sine curve
        assert nmpc._theta_path0 > 0.5
        tail = traj[10:]
        errs = np.abs(tail[:, 1] - np.sin(tail[:, 0]))
        assert np.max(errs) < 0.08
        assert nmpc.stats["converged"]

    def test_path_variable_required_for_path_terms(self):
        m = Model(name="pt")
        m.set_dynamical_states(["px"])
        m.set_inputs(["vx"])
        m.set_dynamical_equations(lambda x, u: u)
        nmpc = NMPC(m)
        nmpc.horizon = 5
        nmpc.quad_stage_cost.add_states(
            names=["px"], weights=1.0, path_following=True,
            path_fn=lambda th: jnp.stack([th]))
        # setup auto-enables the path variable when path terms exist
        nmpc.setup(options={"dt": 0.1})
        assert nmpc._path_following


class TestDebugger:
    def test_iterate_recording_and_plot(self, tmp_path):
        nmpc = NMPC(double_integrator())
        nmpc.horizon = 8
        nmpc.quad_stage_cost.add_states(weights=[1.0, 0.5])
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.set_box_constraints(u_lb=-1.0, u_ub=1.0)
        nmpc.setup(options={"dt": 0.2, "ipopt_debugger": True})
        nmpc.optimize([1.0, 0.0])
        hist = nmpc.iteration_history
        n = int(hist["n"])
        assert n >= 2
        # KKT error decreases over the recorded iterates
        assert hist["kkt"][n - 1] < hist["kkt"][0]
        fig = nmpc.plot_iterations(save_as=str(tmp_path / "iters.png"))
        assert (tmp_path / "iters.png").exists()


class TestSwingUp:
    def test_cartpole_swingup_plan(self):
        # hard nonconvex problem: hanging -> upright with force and track limits
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "swingup_example",
            os.path.join(os.path.dirname(__file__), "..", "examples",
                         "07_cartpole_swingup.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # N=60 (3 s horizon): validated swing-up configuration
        nmpc = mod.build_controller(N=60, dt=0.05)
        nmpc.optimize([0.0, np.pi, 0.0, 0.0], runs=6, seed=0)
        assert nmpc.stats["converged"], nmpc.stats
        X = nmpc.return_prediction()["x"]
        U = nmpc.return_prediction()["u"]
        # pendulum ends near upright, cart stays on the track, force within limits
        assert abs(X[-1, 1]) < 0.2
        assert np.all(np.abs(X[:, 0]) <= 2.0 + 1e-6)
        assert np.all(np.abs(U) <= 15.0 + 1e-6)
