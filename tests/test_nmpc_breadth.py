"""NMPC breadth: DAE models, scaling, measurement costs, multi-start (reference
coverage: test_NMPC.py DAE collocation/rk tests, set_scaling, measurement refs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import Model, NMPC


def dae_model():
    # x' = -x + z + u, 0 = z - 0.5 x  (effective: x' = -0.5x + u)
    m = Model(name="dae")
    m.set_dynamical_states("x")
    m.set_algebraic_states("zv")
    m.set_inputs("u")
    m.set_dynamical_equations(lambda x, z, u: -x + z + u)
    m.set_algebraic_equations(lambda x, z: z - 0.5 * x)
    return m


class TestDAENMPC:
    def test_dae_collocation_nmpc(self):
        nmpc = NMPC(dae_model())
        nmpc.horizon = 10
        nmpc.quad_stage_cost.add_states(weights=5.0, ref=[1.0])
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.setup(options={"dt": 0.2, "integration_method": "collocation",
                            "degree": 2})
        nmpc.optimize([0.0])
        assert nmpc.stats["converged"]
        # x' = -0.5x + u driven toward ref 1 over the horizon
        X = nmpc.return_prediction()["x"]
        assert 0.5 < X[-1, 0] < 1.1

    def test_dae_matches_equivalent_ode(self):
        ode = Model(name="ode_equiv")
        ode.set_dynamical_states("x")
        ode.set_inputs("u")
        ode.set_dynamical_equations(lambda x, u: -0.5 * x + u)

        def build(model, method, **kw):
            c = NMPC(model)
            c.horizon = 8
            c.quad_stage_cost.add_states(weights=5.0, ref=[1.0])
            c.quad_stage_cost.add_inputs(weights=0.1)
            c.setup(options={"dt": 0.2, "integration_method": method, **kw})
            return c.optimize([0.0])

        u_dae = build(dae_model(), "collocation", degree=3)
        u_ode = build(ode, "rk4")
        np.testing.assert_allclose(u_dae, u_ode, atol=1e-5)


class TestScaling:
    def test_scaled_solve_matches_unscaled(self):
        # badly-scaled system: states O(1e3), inputs O(1e-2)
        def make(scaled):
            m = Model()
            m.set_dynamical_states("T")
            m.set_inputs("q")
            m.set_dynamical_equations(lambda x, u: -0.5 * (x - 300.0) + 5000.0 * u)
            c = NMPC(m)
            c.horizon = 10
            c.quad_stage_cost.add_states(weights=1e-4, ref=[350.0])
            c.quad_stage_cost.add_inputs(weights=100.0)
            c.set_box_constraints(u_lb=-0.05, u_ub=0.05)
            if scaled:
                c.set_scaling(x_scaling=[100.0], u_scaling=[0.01])
            c.setup(options={"dt": 0.1, "tol": 1e-8})
            return c.optimize([300.0])

        u_plain = make(False)
        u_scaled = make(True)
        np.testing.assert_allclose(u_scaled, u_plain, rtol=1e-4, atol=1e-7)

    def test_scaling_improves_conditioning(self):
        m = Model()
        m.set_dynamical_states("T")
        m.set_inputs("q")
        m.set_dynamical_equations(lambda x, u: -0.5 * (x - 300.0) + 5000.0 * u)
        c = NMPC(m)
        c.horizon = 10
        c.quad_stage_cost.add_states(weights=1e-4, ref=[350.0])
        c.quad_stage_cost.add_inputs(weights=100.0)
        c.set_scaling(x_scaling=[100.0], u_scaling=[0.01])
        c.setup(options={"dt": 0.1})
        c.optimize([300.0])
        assert c.stats["converged"]


class TestMeasurementCost:
    def test_quad_cost_on_measurements(self):
        m = Model()
        m.set_dynamical_states(["a", "b"])
        m.set_inputs("u")
        m.set_measurements(["y_sum"])
        m.set_dynamical_equations(
            lambda x, u: jnp.array([-x[0] + u[0], -2.0 * x[1] + u[0]]))
        m.set_measurement_equations(lambda x: jnp.array([x[0] + x[1]]))
        nmpc = NMPC(m)
        nmpc.horizon = 10
        nmpc.quad_stage_cost.add_measurements(weights=5.0, ref=[1.0])
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.setup(options={"dt": 0.2})
        nmpc.optimize([0.0, 0.0])
        assert nmpc.stats["converged"]
        # measured sum should head toward 1
        X = nmpc.return_prediction()["x"]
        assert X[-1].sum() > 0.5


class TestMultiStart:
    def test_runs_kwarg_recovers_nonconvex(self):
        # W-shaped cost: x'=u, stage cost (x^2-1)^2 — two symmetric optima
        m = Model()
        m.set_dynamical_states("x")
        m.set_inputs("u")
        m.set_dynamical_equations(lambda x, u: u)
        nmpc = NMPC(m)
        nmpc.horizon = 6
        nmpc.stage_cost.cost = lambda x, u: (x[0] ** 2 - 1.0) ** 2 + 0.01 * u[0] ** 2
        nmpc.set_box_constraints(u_lb=-4.0, u_ub=4.0)
        nmpc.setup(options={"dt": 0.25})
        u = nmpc.optimize([0.0], runs=5, seed=1)
        # should settle into one of the wells (|x| -> 1) rather than the hump
        X = nmpc.return_prediction()["x"]
        assert abs(abs(X[-1, 0]) - 1.0) < 0.2
