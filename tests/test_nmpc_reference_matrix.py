"""Feature-combination matrix mirrored from the reference's densest NMPC tests
(reference: tests/test_NMPC.py TestTrajectoryPathFollowingMPC test_pf_v2..v12 /
test_tt_*, TestChangeInputWeight test_ciw_v1..v4, test_vr_1,
TestTimeVaryingWeights). Same 2-D point-mass model (mass M=5, forces Fx/Fy,
reference: test_NMPC.py:741-780), rebuilt with callables instead of CasADi
symbols."""
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import Model, NMPC, SimpleControlLoop

M = 5.0
X0 = np.array([0.0, 0.0, 0.0, 0.0])


def point_mass():
    m = Model(name="pm")
    m.set_dynamical_states(["x", "vx", "y", "vy"])
    m.set_inputs(["Fx", "Fy"])
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], u[0] / M, x[3], u[1] / M]))
    m.setup(dt=0.1)
    return m


def sine_path(th):
    return jnp.stack([jnp.sin(th), jnp.sin(2.0 * th)])


def _one_step(nmpc, x0=X0):
    u = nmpc.optimize(x0)
    assert nmpc.stats["converged"], nmpc.stats
    pred = nmpc.return_prediction()
    assert np.all(np.isfinite(pred["x"]))
    return u, pred


class TestPathFollowingMatrix:
    """pf_v2..v5: combinations of path-following and constant-reference cost
    terms (reference: test_NMPC.py:789-1060)."""

    def _nmpc(self):
        nmpc = NMPC(point_mass())
        nmpc.horizon = 10
        # mild input regularization removes the flat directions of the pure
        # path objective (the reference leans on IPOPT's loose default tol)
        nmpc.quad_stage_cost.add_inputs(weights=[1e-3, 1e-3])
        nmpc.set_box_constraints(u_lb=[-20.0, -20.0], u_ub=[20.0, 20.0])
        return nmpc

    def test_pf_v2_stage_and_terminal_path(self):
        nmpc = self._nmpc()
        nmpc.quad_stage_cost.add_states(names=["x", "y"], weights=[10, 10],
                                        path_following=True, path_fn=sine_path)
        nmpc.quad_terminal_cost.add_states(names=["x", "y"], weights=[10, 10],
                                           path_following=True,
                                           path_fn=sine_path)
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        _one_step(nmpc)
        assert nmpc._theta_path0 >= 0.0

    def test_pf_v3_path_added_multiple_times(self):
        # the same path split over two separate add_states calls
        nmpc = self._nmpc()
        nmpc.quad_stage_cost.add_states(
            names=["x"], weights=[10], path_following=True,
            path_fn=lambda th: jnp.atleast_1d(jnp.sin(th)))
        nmpc.quad_stage_cost.add_states(
            names=["y"], weights=[10], path_following=True,
            path_fn=lambda th: jnp.atleast_1d(jnp.sin(2.0 * th)))
        nmpc.quad_terminal_cost.add_states(names=["x", "y"], weights=[10, 10],
                                           path_following=True,
                                           path_fn=sine_path)
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        _one_step(nmpc)

    def test_pf_v4_path_plus_constant_reference(self):
        nmpc = self._nmpc()
        nmpc.quad_stage_cost.add_states(
            names=["x"], weights=[10], path_following=True,
            path_fn=lambda th: jnp.atleast_1d(jnp.sin(th)))
        nmpc.quad_stage_cost.add_states(names=["y"], weights=[10], ref=[1.0])
        nmpc.quad_terminal_cost.add_states(
            names=["x"], weights=[10], path_following=True,
            path_fn=lambda th: jnp.atleast_1d(jnp.sin(th)))
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        u, pred = _one_step(nmpc)
        # constant reference pulls y up
        assert pred["x"][-1, 2] > 0.01

    def test_pf_v5_conflicting_path_and_reference(self):
        # same state appears in a path term and (twice) in a constant-ref term
        nmpc = self._nmpc()
        nmpc.quad_stage_cost.add_states(names=["x", "y"], weights=[10, 10],
                                        path_following=True, path_fn=sine_path)
        nmpc.quad_stage_cost.add_states(names=["y"], weights=[1], ref=[1.0])
        nmpc.quad_terminal_cost.add_states(
            names=["x"], weights=[10], path_following=True,
            path_fn=lambda th: jnp.atleast_1d(jnp.sin(th)))
        nmpc.quad_stage_cost.add_states(names=["y"], weights=[1], ref=[1.0])
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        _one_step(nmpc)


class TestChangeInputWeightMatrix:
    """ciw_v1..v4: input-change costs combined with path following
    (reference: test_NMPC.py:2180-2382)."""

    def _path_nmpc(self):
        nmpc = NMPC(point_mass())
        nmpc.horizon = 10
        nmpc.quad_stage_cost.add_states(names=["x", "y"], weights=[10, 10],
                                        path_following=True, path_fn=sine_path)
        nmpc.quad_terminal_cost.add_states(names=["x", "y"], weights=[10, 10],
                                           path_following=True,
                                           path_fn=sine_path)
        nmpc.set_box_constraints(u_lb=[-20.0, -20.0], u_ub=[20.0, 20.0])
        return nmpc

    def test_ciw_v1_one_input_change(self):
        nmpc = self._path_nmpc()
        nmpc.quad_stage_cost.add_inputs_change(names=["Fx"], weights=[10])
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        _one_step(nmpc)

    def test_ciw_v2_two_input_changes_separately(self):
        nmpc = self._path_nmpc()
        nmpc.quad_stage_cost.add_inputs_change(names=["Fx"], weights=[10])
        nmpc.quad_stage_cost.add_inputs_change(names=["Fy"], weights=[5])
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        _one_step(nmpc)

    def test_ciw_v3_all_inputs_at_once(self):
        nmpc = self._path_nmpc()
        nmpc.quad_stage_cost.add_inputs_change(names=["Fx", "Fy"],
                                               weights=[10, 5])
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        _one_step(nmpc)

    def test_ciw_v4_mixed_with_quad_input_cost(self):
        nmpc = self._path_nmpc()
        nmpc.quad_stage_cost.add_inputs(names=["Fx", "Fy"],
                                        weights=[0.01, 0.01])
        nmpc.quad_stage_cost.add_inputs_change(names=["Fx"], weights=[10])
        nmpc.create_path_variable(u_pf_ub=2.0, speed_ref=1.0,
                                  speed_weight=0.5)
        nmpc.setup(options={"dt": 0.1})
        _one_step(nmpc)

    def test_input_change_damps_moves(self):
        # quantitative: heavier du weight => smaller first-step input change
        moves = []
        for w in (0.0, 50.0):
            nmpc = NMPC(point_mass())
            nmpc.horizon = 10
            nmpc.quad_stage_cost.add_states(names=["x"], weights=[10],
                                            ref=[1.0])
            if w:
                nmpc.quad_stage_cost.add_inputs_change(names=["Fx"],
                                                       weights=[w])
            nmpc.set_box_constraints(u_lb=[-20.0, -20.0], u_ub=[20.0, 20.0])
            nmpc.setup(options={"dt": 0.1})
            u = nmpc.optimize(X0)
            moves.append(abs(float(np.asarray(u).ravel()[0])))
        assert moves[1] < 0.5 * moves[0]


class TestVaryingReference:
    """vr_1: online setpoint changes through SimpleControlLoop.run(ref_sc=...,
    ref_tc=...) (reference: test_NMPC.py:1758-1791)."""

    def _tracking_nmpc(self):
        nmpc = NMPC(point_mass())
        nmpc.horizon = 10
        nmpc.quad_stage_cost.add_states(names=["x", "y"], weights=[10, 10],
                                        trajectory_tracking=True)
        nmpc.quad_terminal_cost.add_states(names=["x", "y"], weights=[10, 10],
                                           trajectory_tracking=True)
        nmpc.quad_stage_cost.add_inputs(weights=[0.01, 0.01])
        nmpc.set_box_constraints(u_lb=[-50.0, -50.0], u_ub=[50.0, 50.0])
        nmpc.setup(options={"dt": 0.1})
        return nmpc

    def test_vr_1_setpoint_change_in_loop(self):
        nmpc = self._tracking_nmpc()
        plant = point_mass()
        plant.set_initial_conditions(x0=X0)
        scl = SimpleControlLoop(plant, nmpc)
        scl.run(8, ref_sc={"x": 1, "y": 2}, ref_tc={"x": 1, "y": 2})
        x_mid = plant.solution["x:f"]
        # moving toward (1, 2)
        assert x_mid[0] > 0.05 and x_mid[2] > 0.1
        scl.run(8, ref_sc={"x": 2, "y": 1}, ref_tc={"x": 2, "y": 1})
        x_end = plant.solution["x:f"]
        assert x_end[0] > x_mid[0]  # x keeps rising toward 2

    def test_ref_dict_direct_optimize(self):
        nmpc = self._tracking_nmpc()
        u = nmpc.optimize(X0, ref_sc={"x": 1.0, "y": 0.0},
                          ref_tc={"x": 1.0, "y": 0.0})
        assert nmpc.stats["converged"]
        assert float(np.asarray(u).ravel()[0]) > 0.1  # pushes +x

    def test_ref_timeseries_window(self):
        nmpc = self._tracking_nmpc()
        ts = np.linspace(0.0, 1.0, 40)
        nmpc.optimize(X0, ref_sc={"x": ts, "y": 0.0},
                      ref_tc={"x": 1.0, "y": 0.0})
        assert nmpc.stats["converged"]

    def test_ref_timeseries_too_short_raises(self):
        nmpc = self._tracking_nmpc()
        with pytest.raises(ValueError, match="data points"):
            nmpc.optimize(X0, ref_sc={"x": np.zeros(5), "y": 0.0},
                          ref_tc={"x": 0.0, "y": 0.0})

    def test_unknown_name_raises(self):
        nmpc = self._tracking_nmpc()
        with pytest.raises(ValueError, match="unknown variable"):
            nmpc.optimize(X0, ref_sc={"nope": 1.0, "x": 0.0, "y": 0.0},
                          ref_tc={"x": 0.0, "y": 0.0})

    def test_non_dict_raises(self):
        nmpc = self._tracking_nmpc()
        with pytest.raises(TypeError, match="ref_sc"):
            nmpc.optimize(X0, ref_sc=[1.0, 2.0])

    def test_missing_reference_raises(self):
        nmpc = self._tracking_nmpc()
        with pytest.raises(ValueError, match="runtime reference"):
            nmpc.optimize(X0)


class TestTimeVaryingWeights:
    """Cost weights as model parameters passed per solve via cp
    (reference: test_NMPC.py:2840-2907)."""

    def test_time_varying_weights(self):
        m = Model(name="pmw")
        m.set_dynamical_states(["x", "vx", "y", "vy"])
        m.set_inputs(["Fx", "Fy"])
        m.set_parameters(["w_x", "w_y"])
        m.set_dynamical_equations(
            lambda x, u, p: jnp.array([x[1], u[0] / M, x[3], u[1] / M]))
        m.setup(dt=0.1)

        nmpc = NMPC(m)
        nmpc.horizon = 15
        nmpc.stage_cost.cost = (
            lambda x, u, p, t: p[0] * x[0] ** 2 + p[1] * x[2] ** 2)
        nmpc.quad_stage_cost.add_inputs(weights=[0.1, 0.1])
        nmpc.set_box_constraints(u_lb=[-20.0, -20.0], u_ub=[20.0, 20.0])
        nmpc.setup(options={"dt": 0.1})

        x0 = np.array([1.0, 0.0, 1.0, 0.0])
        u_a = np.asarray(nmpc.optimize(x0, cp=[10.0, 0.0])).ravel()
        assert nmpc.stats["converged"]
        nmpc2 = NMPC(m)
        nmpc2.horizon = 15
        nmpc2.stage_cost.cost = (
            lambda x, u, p, t: p[0] * x[0] ** 2 + p[1] * x[2] ** 2)
        nmpc2.quad_stage_cost.add_inputs(weights=[0.1, 0.1])
        nmpc2.set_box_constraints(u_lb=[-20.0, -20.0], u_ub=[20.0, 20.0])
        nmpc2.setup(options={"dt": 0.1})
        u_b = np.asarray(nmpc2.optimize(x0, cp=[0.0, 10.0])).ravel()
        # weight on x drives Fx; weight on y drives Fy
        assert abs(u_a[0]) > 5 * abs(u_a[1])
        assert abs(u_b[1]) > 5 * abs(u_b[0])
