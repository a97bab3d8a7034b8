"""Trajectory-tracking NMPC breadth.

Mirrors the reference's tt_v8..v20 variant family (reference:
tests/test_NMPC.py trajectory-tracking block): trajectory references on
all states / state subsets / inputs / measurements, mixtures with
constant references, terminal costs and Δu damping, window advance and
end-of-trajectory behavior, and validation errors. The double
integrator keeps every solve small (N<=8, nx=2) so the whole file
compiles few distinct configs.
"""
import numpy as np
import pytest

from hilo_mpc_tpu import NMPC, Model


def _di(dt=0.1):
    m = Model(name="di")
    m.set_inputs("u")
    m.set_equations("""
    dpos/dt = vel(t)
    dvel/dt = u(k)
    y(k) = pos(t)
    """)
    return m


def _plant(dt=0.1):
    m = _di()
    m.setup(dt=dt, integration_method="rk4")
    m.set_initial_conditions([0.0, 0.0])
    return m


def _ramp(T, stop=0.5):
    pos = np.linspace(0.0, stop, T)
    vel = np.gradient(pos, 0.1)
    return pos, vel


def _run_loop(nmpc, plant, steps):
    x = np.array([0.0, 0.0])
    xs = [x]
    for _ in range(steps):
        u = nmpc.optimize(x)
        x = plant.simulate(u=u, steps=1)["x"][-1]
        xs.append(np.asarray(x))
    return np.asarray(xs)


def _tt_nmpc(traj, names=None, N=8, du_weight=None, term_ref=None):
    nmpc = NMPC(_di())
    nmpc.horizon = N
    nmpc.quad_stage_cost.add_states(names=names, weights=10.0, ref=traj)
    nmpc.quad_stage_cost.add_inputs(weights=0.05)
    if du_weight is not None:
        nmpc.quad_stage_cost.add_inputs_change(weights=du_weight)
    if term_ref is not None:
        nmpc.quad_terminal_cost.add_states(weights=20.0, ref=term_ref)
    nmpc.setup(options={"dt": 0.1})
    return nmpc


class TestTrajectoryVariants:
    def test_full_state_ramp_tracked(self):
        T = 40
        pos, vel = _ramp(T)
        nmpc = _tt_nmpc(np.stack([pos, vel], axis=1))
        xs = _run_loop(nmpc, _plant(), 25)
        # position follows the ramp: compare against the reference at each step
        err = np.abs(xs[5:25, 0] - pos[5:25])
        assert err.max() < 0.03, err.max()
        assert nmpc.stats["converged"]

    def test_subset_single_state_trajectory(self):
        T = 40
        pos, _ = _ramp(T)
        nmpc = _tt_nmpc(pos[:, None], names=["pos"])
        xs = _run_loop(nmpc, _plant(), 20)
        assert abs(xs[-1, 0] - pos[20]) < 0.05

    def test_trajectory_on_inputs(self):
        T = 40
        u_traj = 0.3 * np.sin(np.linspace(0, 2 * np.pi, T))[:, None]
        nmpc = NMPC(_di())
        nmpc.horizon = 6
        nmpc.quad_stage_cost.add_states(weights=[0.01, 0.01])
        nmpc.quad_stage_cost.add_inputs(weights=50.0, ref=u_traj)
        nmpc.setup(options={"dt": 0.1})
        plant = _plant()
        x = np.array([0.0, 0.0])
        us = []
        for _ in range(15):
            u = nmpc.optimize(x)
            us.append(float(np.asarray(u).ravel()[0]))
            x = plant.simulate(u=u, steps=1)["x"][-1]
        # applied inputs follow their reference trajectory
        np.testing.assert_allclose(us[2:10], u_traj[2:10, 0], atol=0.05)

    def test_trajectory_plus_constant_reference_mix(self):
        T = 40
        pos, _ = _ramp(T)
        nmpc = NMPC(_di())
        nmpc.horizon = 8
        nmpc.quad_stage_cost.add_states(names=["pos"], weights=10.0,
                                        ref=pos[:, None])
        nmpc.quad_stage_cost.add_states(names=["vel"], weights=0.5, ref=[0.1])
        nmpc.quad_stage_cost.add_inputs(weights=0.05)
        nmpc.setup(options={"dt": 0.1})
        xs = _run_loop(nmpc, _plant(), 20)
        assert nmpc.stats["converged"]
        assert abs(xs[-1, 0] - pos[20]) < 0.1

    def test_trajectory_with_terminal_cost(self):
        T = 40
        pos, vel = _ramp(T)
        nmpc = _tt_nmpc(np.stack([pos, vel], axis=1),
                        term_ref=[0.5, 0.0])
        xs = _run_loop(nmpc, _plant(), 20)
        assert nmpc.stats["converged"]
        assert np.all(np.isfinite(xs))

    def test_trajectory_with_du_damping(self):
        T = 40
        pos, vel = _ramp(T)
        fast = _tt_nmpc(np.stack([pos, vel], axis=1))
        damped = _tt_nmpc(np.stack([pos, vel], axis=1), du_weight=5.0)
        p1, p2 = _plant(), _plant()
        x = np.array([0.0, 0.0])
        u_f = float(np.asarray(fast.optimize(x)).ravel()[0])
        u_d = float(np.asarray(damped.optimize(x)).ravel()[0])
        # Δu penalty shrinks the first move away from u_old = 0
        assert abs(u_d) < abs(u_f)

    def test_window_advances_with_controller_time(self):
        T = 30
        pos, vel = _ramp(T)
        nmpc = _tt_nmpc(np.stack([pos, vel], axis=1), N=5)
        x = np.array([0.0, 0.0])
        nmpc.optimize(x)
        r1 = np.asarray(nmpc.get_reference()) if hasattr(
            nmpc, "get_reference") else None
        nmpc.optimize(x)
        if r1 is not None and hasattr(nmpc, "get_reference"):
            r2 = np.asarray(nmpc.get_reference())
            assert not np.allclose(r1, r2)  # the window moved one step

    def test_end_of_trajectory_holds_last_value(self):
        T = 12   # shorter than the closed loop + horizon
        pos, _ = _ramp(T, stop=0.3)
        # track position only: a held velocity reference would conflict with
        # standing still at the endpoint
        nmpc = _tt_nmpc(pos[:, None], names=["pos"], N=5)
        xs = _run_loop(nmpc, _plant(), 25)
        assert nmpc.stats["converged"]
        # past the end the last reference row is held: settle near 0.3
        assert abs(xs[-1, 0] - 0.3) < 0.05

    def test_measurement_trajectory_reference(self):
        T = 40
        pos, _ = _ramp(T)
        nmpc = NMPC(_di())
        nmpc.horizon = 6
        nmpc.quad_stage_cost.add_measurements(weights=10.0, ref=pos[:, None])
        nmpc.quad_stage_cost.add_inputs(weights=0.05)
        nmpc.setup(options={"dt": 0.1})
        xs = _run_loop(nmpc, _plant(), 15)
        assert nmpc.stats["converged"]
        assert abs(xs[-1, 0] - pos[15]) < 0.08


class TestTrajectoryValidation:
    def test_wrong_trajectory_columns_raise(self):
        nmpc = NMPC(_di())
        with pytest.raises(ValueError, match="columns"):
            nmpc.quad_stage_cost.add_states(weights=1.0,
                                            ref=np.zeros((40, 3)))

    def test_wrong_subset_columns_raise(self):
        nmpc = NMPC(_di())
        with pytest.raises(ValueError, match="columns"):
            nmpc.quad_stage_cost.add_states(names=["pos"], weights=1.0,
                                            ref=np.zeros((40, 2)))
