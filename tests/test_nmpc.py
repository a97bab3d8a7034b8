"""NMPC feature tests (mirrors reference test tiers for tests/test_NMPC.py):
construction/validation, closed-loop convergence, Δu & control horizon, soft
constraints, custom constraints, tvp, trajectory tracking, batched solves."""
import numpy as np
import pytest

from hilo_mpc_tpu import Model, NMPC
from hilo_mpc_tpu.control.nmpc import OptimalControlProblem
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

CSTR_P = [1.0] * 6  # a_1, b_1, a_2, b_2, g, E
CSTR_EQ = [0.3, 0.18055]  # equilibrium pair for u_ss = -0.1194
CSTR_X0 = [0.2, 0.1]


def make_cstr_nmpc(N=15, **box):
    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = N
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=CSTR_EQ)
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_parameters(CSTR_P)
    if box:
        nmpc.set_box_constraints(**box)
    return nmpc


def make_plant():
    plant = cstr_schaffner_and_zeitz()
    plant.setup(dt=0.1, integration_method="rk4")
    plant.set_initial_conditions(CSTR_X0)
    plant.set_initial_parameter_values(CSTR_P)
    return plant


def run_loop(nmpc, plant, steps=25):
    x = np.array(CSTR_X0, dtype=float)
    for _ in range(steps):
        u = nmpc.optimize(x)
        x = plant.simulate(u=u, steps=1)["x"][-1]
    return x


class TestConstruction:
    def test_horizon_required(self):
        with pytest.raises(ValueError):
            NMPC(cstr_schaffner_and_zeitz()).setup(options={"dt": 0.1})

    def test_invalid_option_rejected(self):
        nmpc = make_cstr_nmpc()
        with pytest.raises(ValueError, match="unknown options"):
            nmpc.setup(options={"dt": 0.1, "bogus": 1})

    def test_unknown_cost_state(self):
        nmpc = NMPC(cstr_schaffner_and_zeitz())
        with pytest.raises(ValueError, match="unknown states"):
            nmpc.quad_stage_cost.add_states(names=["nope"], weights=1.0)

    def test_wrong_x0_size(self):
        nmpc = make_cstr_nmpc(N=5)
        nmpc.setup(options={"dt": 0.1})
        with pytest.raises(ValueError, match="x0 has"):
            nmpc.optimize(np.zeros(5))

    def test_optimize_before_setup(self):
        with pytest.raises(RuntimeError):
            make_cstr_nmpc().optimize(CSTR_X0)


class TestClosedLoop:
    def test_tracks_equilibrium(self):
        nmpc = make_cstr_nmpc(u_lb=-5.0, u_ub=5.0)
        nmpc.setup(options={"dt": 0.1, "tol": 1e-8})
        x = run_loop(nmpc, make_plant())
        assert np.linalg.norm(x - CSTR_EQ) < 5e-3
        assert nmpc.stats["converged"]
        assert nmpc.stats["kkt_error"] < 1e-7

    def test_input_bound_respected(self):
        nmpc = make_cstr_nmpc(u_lb=-0.05, u_ub=0.05)
        nmpc.setup(options={"dt": 0.1})
        plant = make_plant()
        x = np.array(CSTR_X0)
        for _ in range(10):
            u = nmpc.optimize(x)
            assert -0.05 - 1e-7 <= u[0] <= 0.05 + 1e-7
            x = plant.simulate(u=u, steps=1)["x"][-1]

    def test_collocation_integration(self):
        nmpc = make_cstr_nmpc(N=10)
        nmpc.setup(options={"dt": 0.1, "integration_method": "collocation",
                            "degree": 2})
        u = nmpc.optimize(CSTR_X0)
        assert nmpc.stats["converged"]
        # rk4 and collocation should agree closely on this smooth problem
        nmpc2 = make_cstr_nmpc(N=10)
        nmpc2.setup(options={"dt": 0.1, "integration_method": "rk4"})
        u2 = nmpc2.optimize(CSTR_X0)
        np.testing.assert_allclose(u, u2, atol=1e-4)


class TestDeltaU:
    def test_du_penalty_smooths(self):
        fast = make_cstr_nmpc()
        fast.setup(options={"dt": 0.1})
        smooth = make_cstr_nmpc()
        smooth.quad_stage_cost.add_inputs_change(weights=50.0)
        smooth.setup(options={"dt": 0.1})
        assert smooth._augment_du and not fast._augment_du
        u_fast = fast.optimize(CSTR_X0)
        u_smooth = smooth.optimize(CSTR_X0)
        # heavy du penalty keeps first move near u_old = 0
        assert abs(u_smooth[0]) < abs(u_fast[0])

    def test_du_bounds_enforced(self):
        nmpc = make_cstr_nmpc(du_lb=-0.02, du_ub=0.02)
        nmpc.setup(options={"dt": 0.1})
        plant = make_plant()
        x = np.array(CSTR_X0)
        prev = 0.0
        for _ in range(8):
            u = nmpc.optimize(x)
            assert abs(u[0] - prev) <= 0.02 + 1e-6
            prev = u[0]
            x = plant.simulate(u=u, steps=1)["x"][-1]

    def test_control_horizon(self):
        nmpc = make_cstr_nmpc(N=12)
        nmpc.control_horizon = 4
        nmpc.setup(options={"dt": 0.1})
        nmpc.optimize(CSTR_X0)
        pred_u = nmpc.return_prediction()["u"]
        # controls frozen after Nc
        np.testing.assert_allclose(pred_u[4:], np.tile(pred_u[4], (8, 1)),
                                   atol=1e-7)


class TestConstraints:
    def test_soft_state_bound(self):
        nmpc = make_cstr_nmpc(x_ub=[0.25, 1.0], x_soft=True, soft_weight=1e3)
        nmpc.setup(options={"dt": 0.1})
        x = run_loop(nmpc, make_plant(), steps=20)
        # soft bound pulls x_1 below the reference equilibrium
        assert x[0] < 0.27

    def test_hard_custom_stage_constraint(self):
        nmpc = make_cstr_nmpc(N=10)
        nmpc.add_stage_constraint(lambda x, u: x[1] + 0.5 * u[0], ub=0.5, n=1)
        nmpc.setup(options={"dt": 0.1})
        nmpc.optimize(CSTR_X0)
        assert nmpc.stats["converged"]
        X = nmpc.return_prediction()["x"]
        U = nmpc.return_prediction()["u"]
        g = X[1:-1, 1] + 0.5 * U[1:, 0]
        assert np.all(g <= 0.5 + 1e-6)

    def test_terminal_constraint(self):
        nmpc = make_cstr_nmpc(N=15)
        nmpc.add_terminal_constraint(lambda x: x[0], lb=0.25, ub=0.35, n=1)
        nmpc.setup(options={"dt": 0.1})
        nmpc.optimize(CSTR_X0)
        assert nmpc.stats["converged"]
        xN = nmpc.return_prediction()["x"][-1]
        assert 0.25 - 1e-6 <= xN[0] <= 0.35 + 1e-6


class TestReferences:
    def test_trajectory_tracking_window(self):
        # time-varying reference supplied as a (T, n) trajectory
        T = 40
        traj = np.stack([np.linspace(0.2, 0.3, T), np.linspace(0.1, 0.18, T)],
                        axis=1)
        nmpc = NMPC(cstr_schaffner_and_zeitz())
        nmpc.horizon = 8
        nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=traj)
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.set_parameters(CSTR_P)
        nmpc.setup(options={"dt": 0.1})
        plant = make_plant()
        x = np.array(CSTR_X0)
        for _ in range(12):
            u = nmpc.optimize(x)
            x = plant.simulate(u=u, steps=1)["x"][-1]
        assert nmpc.stats["converged"]

    def test_tvp(self):
        model = Model()
        model.set_equations("dx/dt = -a*x(t) + u(k)")
        nmpc = NMPC(model)
        nmpc.horizon = 5
        nmpc.quad_stage_cost.add_states(weights=1.0, ref=[1.0])
        nmpc.quad_stage_cost.add_inputs(weights=0.01)
        nmpc.set_time_varying_parameters(["a"],
                                         values={"a": np.linspace(1.0, 2.0, 50)})
        nmpc.setup(options={"dt": 0.1})
        u = nmpc.optimize([0.5])
        assert nmpc.stats["converged"]
        assert u[0] > 0  # must push up toward ref


class TestOCP:
    def test_open_loop_replay(self):
        ocp = OptimalControlProblem(cstr_schaffner_and_zeitz())
        ocp.horizon = 10
        ocp.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=CSTR_EQ)
        ocp.quad_stage_cost.add_inputs(weights=0.1)
        ocp.set_parameters(CSTR_P)
        ocp.setup(options={"dt": 0.1})
        u_seq = [ocp.optimize(CSTR_X0) for _ in range(3)]
        pred = ocp.return_prediction()["u"]
        np.testing.assert_allclose(np.stack(u_seq), pred[:3], atol=1e-10)


class TestBatched:
    def test_optimize_batch_matches_solo(self):
        nmpc = make_cstr_nmpc(N=10, u_lb=-5.0, u_ub=5.0)
        nmpc.setup(options={"dt": 0.1})
        rng = np.random.default_rng(0)
        x0s = np.array(CSTR_X0) + 0.05 * rng.standard_normal((6, 2))
        u_batch, sol = nmpc.optimize_batch(x0s)
        assert u_batch.shape == (6, 1)
        assert bool(np.all(np.asarray(sol.converged)))
        solo = make_cstr_nmpc(N=10, u_lb=-5.0, u_ub=5.0)
        solo.setup(options={"dt": 0.1})
        u3 = solo.optimize(x0s[3])
        np.testing.assert_allclose(u_batch[3], u3, atol=1e-6)


class TestPrecisionParity:
    def test_f32_solve_within_control_deviation_budget(self):
        # BASELINE.json target: <1e-4 control deviation vs the f64 (IPOPT-class)
        # solution. The solver takes its dtype from the initial-trajectory arrays.
        import jax.numpy as jnp
        from functools import partial

        from hilo_mpc_tpu.ops.ip_solver import solve_ocp
        import dataclasses

        nmpc = make_cstr_nmpc(N=20, u_lb=-5.0, u_ub=5.0)
        nmpc.setup(options={"dt": 0.1})
        rng = np.random.default_rng(0)
        x0s = np.array(CSTR_X0) + 0.05 * rng.standard_normal((8, 2))
        args64 = nmpc.prepare_batch(x0s)
        # 3e-5 KKT tolerance: reliably reachable in f32, far inside the 1e-4
        # control-deviation budget
        opts32 = dataclasses.replace(nmpc._ip_opts, tol=3e-5)
        solver = lambda opts: partial(solve_ocp, nmpc._funcs, nmpc._dims,
                                      options=opts, fix_x0=True)
        import jax

        sol64 = jax.vmap(lambda th, x0, X, U: solver(nmpc._ip_opts)(
            nmpc._bounds, th, x0, X, U))(*args64)
        args32 = tuple(jnp.asarray(a, jnp.float32) for a in args64)
        bounds32 = type(nmpc._bounds)(*[jnp.asarray(b, jnp.float32)
                                        for b in nmpc._bounds])
        sol32 = jax.vmap(lambda th, x0, X, U: solver(opts32)(
            bounds32, th, x0, X, U))(*args32)
        assert bool(np.asarray(sol32.converged).all())
        dev = np.abs(np.asarray(sol32.U[:, 0], dtype=np.float64)
                     - np.asarray(sol64.U[:, 0]))
        assert dev.max() < 1e-4, f"f32 control deviation {dev.max():.2e}"
