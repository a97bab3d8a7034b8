"""Mixed-integer NMPC tests.

The reference reserves MINLP plumbing ('bonmin' in optimizer.py:897,
`_mixed_integer_flag` mpc.py:56) but never activates it; here discrete inputs are a
working feature: relaxed interior-point solve + one vmapped batch of pinned rounding
candidates (see NMPC.set_discrete_inputs / _mi_refine).
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import Model, NMPC


def double_integrator(dt=0.2):
    m = Model()
    m.set_dynamical_states(["p", "v"])
    m.set_inputs("u")
    m.set_dynamical_equations(lambda x, u: jnp.array([x[1], u[0]]))
    m.setup(dt=dt)
    return m


def make_controller(m, levels, N=12, **opts):
    c = NMPC(m)
    c.horizon = N
    c.quad_stage_cost.add_states(["p", "v"], weights=[10.0, 1.0], ref=[1.0, 0.0])
    c.quad_stage_cost.add_inputs("u", weights=0.1)
    c.quad_terminal_cost.add_states(["p", "v"], weights=[50.0, 5.0],
                                    ref=[1.0, 0.0])
    c.set_box_constraints(u_lb=min(levels), u_ub=max(levels))
    c.set_discrete_inputs("u", levels=levels)
    c.setup(options={"tol": 1e-6, **opts})
    return c


class TestMixedIntegerNMPC:
    def test_controls_on_levels_and_closed_loop_converges(self):
        m = double_integrator()
        c = make_controller(m, [-1.0, 0.0, 1.0])
        x = np.array([0.0, 0.0])
        for _ in range(25):
            u = c.optimize(x)
            assert min(abs(u[0] - l) for l in (-1.0, 0.0, 1.0)) < 1e-12
            out = m.simulate(x0=x, u=u.reshape(1, -1), steps=1, store=False)
            x = np.asarray(out["x"][-1]).ravel()
        # bang-bang reaches the setpoint exactly with the coarse input set
        np.testing.assert_allclose(x, [1.0, 0.0], atol=1e-4)

    def test_stats_report_candidates_and_gap(self):
        c = make_controller(double_integrator(), [-1.0, 0.0, 1.0])
        c.optimize([0.0, 0.0])
        assert c.stats["mi_candidates"] >= 4
        assert c.stats["mi_feasible"] >= 1
        # discrete-feasible objective can never beat the relaxed lower bound
        assert c.stats["mi_gap"] >= -1e-8
        assert c.stats["converged"]

    def test_matches_brute_force_enumeration(self):
        """Short-horizon binary problem: exact mode (lattice <= mi_max_enum
        enumerates every assignment) must match an independent brute force, and
        the rounding-neighborhood heuristic (enumeration disabled) must come
        within a small optimality gap."""
        N = 5
        m = double_integrator(dt=0.4)
        c = make_controller(m, [0.0, 1.0], N=N)
        assert c._mi["cand_enum"] is not None and len(c._mi["cand_enum"]) == 32
        x0 = np.array([0.0, 0.0])

        # exhaustive: pin every binary assignment through the same batched solver
        theta = c._assemble_theta(None, None, None)
        xs0 = c._solver_x0(x0)
        cand = np.array(list(itertools.product([0.0, 1.0], repeat=N)),
                        dtype=float)[:, :, None]                     # (32, N, 1)
        C = cand.shape[0]
        lbu = np.broadcast_to(np.asarray(c._bounds.lbu), (C, N, 1)).copy()
        ubu = lbu.copy()
        lbu[:, :, 0] = cand[:, :, 0]
        ubu[:, :, 0] = cand[:, :, 0]
        U_c = cand.copy()
        X_c = c._rollout_guess_umany_jit(
            jnp.asarray(xs0), jnp.asarray(theta), jnp.asarray(U_c))
        sols = c._solve_mi_jit(jnp.asarray(lbu), jnp.asarray(ubu),
                               jnp.asarray(theta), jnp.asarray(xs0),
                               X_c, jnp.asarray(U_c))
        conv = np.asarray(sols.converged)
        assert conv.all()
        best_bf = float(np.min(np.asarray(sols.objective)))

        c.optimize(x0)
        assert c.stats["objective"] <= best_bf + 1e-6

        # heuristic mode on the same problem: within 3% of the global optimum
        ch = make_controller(double_integrator(dt=0.4), [0.0, 1.0], N=N,
                             mi_max_enum=0)
        assert ch._mi["cand_enum"] is None
        ch.optimize(x0)
        assert ch.stats["objective"] <= 1.03 * best_bf + 1e-6

    def test_integer_lattice_from_bounds(self):
        # levels=None derives the integer lattice from finite box bounds
        m = double_integrator()
        c = NMPC(m)
        c.horizon = 8
        c.quad_stage_cost.add_states(["p", "v"], weights=[10.0, 1.0],
                                     ref=[1.0, 0.0])
        c.quad_stage_cost.add_inputs("u", weights=0.1)
        c.set_box_constraints(u_lb=-2, u_ub=2)
        c.set_discrete_inputs("u")
        c.setup()
        np.testing.assert_allclose(c._mi["levels"][0], [-2, -1, 0, 1, 2])
        u = c.optimize([0.0, 0.0])
        assert abs(u[0] - round(u[0])) < 1e-12

    def test_levels_filtered_by_bounds(self):
        m = double_integrator()
        c = NMPC(m)
        c.horizon = 5
        c.quad_stage_cost.add_states("p", weights=1.0, ref=1.0)
        c.set_box_constraints(u_lb=0.0, u_ub=1.0)
        c.set_discrete_inputs("u", levels=[-1.0, 0.0, 1.0, 2.0])
        c.setup()
        np.testing.assert_allclose(c._mi["levels"][0], [0.0, 1.0])

    def test_on_off_thermostat(self):
        """On/off actuator regulates to a band around an unreachable-in-steady-state
        reference (classic relay control)."""
        m = Model()
        m.set_dynamical_states("T")
        m.set_inputs("q")
        m.set_dynamical_equations(lambda x, u: -x + 2.0 * u)
        m.setup(dt=0.25)
        c = NMPC(m)
        c.horizon = 10
        c.quad_stage_cost.add_states("T", weights=10.0, ref=0.5)
        c.set_box_constraints(u_lb=0, u_ub=1)
        c.set_discrete_inputs("q", levels=[0.0, 1.0])
        c.setup()
        x = np.array([0.0])
        traj = []
        for _ in range(30):
            u = c.optimize(x)
            assert u[0] in (0.0, 1.0)
            out = m.simulate(x0=x, u=u.reshape(1, -1), steps=1, store=False)
            x = np.asarray(out["x"][-1]).ravel()
            traj.append(float(x[0]))
        # settles into a band around 0.5 (steady states are 0 or 2, so the
        # controller must chatter)
        assert 0.3 < np.mean(traj[10:]) < 0.8
        assert max(traj[10:]) < 1.0


class TestMixedIntegerValidation:
    def test_incompatible_with_du_formulation(self):
        m = double_integrator()
        c = NMPC(m)
        c.horizon = 8
        c.quad_stage_cost.add_states("p", weights=1.0, ref=1.0)
        c.quad_stage_cost.add_inputs_change("u", weights=0.1)
        c.set_box_constraints(u_lb=-1, u_ub=1)
        c.set_discrete_inputs("u", levels=[-1.0, 1.0])
        with pytest.raises(ValueError, match="Δu"):
            c.setup()

    def test_unknown_input_raises(self):
        c = NMPC(double_integrator())
        with pytest.raises(ValueError, match="unknown input"):
            c.set_discrete_inputs("nope", levels=[0, 1])

    def test_too_few_levels_raises(self):
        c = NMPC(double_integrator())
        with pytest.raises(ValueError, match="levels"):
            c.set_discrete_inputs("u", levels=[1.0])

    def test_lattice_needs_finite_bounds(self):
        c = NMPC(double_integrator())
        c.horizon = 5
        c.quad_stage_cost.add_states("p", weights=1.0, ref=1.0)
        c.set_discrete_inputs("u")
        with pytest.raises(ValueError, match="finite"):
            c.setup()
