"""Equation-string DSL parser tests (reference DSL semantics: util/parsing.py)."""
import numpy as np
import pytest

from hilo_mpc_tpu import Model
from hilo_mpc_tpu.utils.parsing import parse_equations


class TestParser:
    def test_simple_ode_classification(self):
        p = parse_equations("""
        dx/dt = -a*x(t) + u(k)
        y(k) = x(t)
        """)
        assert p.states == ["x"]
        assert p.inputs == ["u"]
        assert p.parameters == ["a"]
        assert p.measurements == ["y"]
        assert not p.discrete

    def test_constants_and_aux(self):
        p = parse_equations("""
        dx/dt = -k0*r
        r = x(t)*exp(-E/(R*T(t)))
        dT/dt = -0.1*T(t)
        R = 8.314
        """)
        assert p.states == ["x", "T"]
        assert "R" in p.constants
        assert p.parameters == ["k0", "E"]

    def test_cstr_schaffner_zeitz_shape(self):
        # same structure as the reference library model (library/models.py:30)
        p = parse_equations("""
        dx_1/dt = -a_1*x_1(t) + b_1*r
        dx_2/dt = -a_2*x_2(t) + b_2*r + g*u(k)
        y(k) = x_2(t)
        r = (1 - x_1(t))*exp(-E/(1 + x_2(t)))
        """)
        assert p.states == ["x_1", "x_2"]
        assert p.inputs == ["u"]
        assert set(p.parameters) == {"a_1", "b_1", "a_2", "b_2", "g", "E"}

    def test_numeric_evaluation(self):
        p = parse_equations("dx/dt = -a*x(t) + u(k)")
        import jax.numpy as jnp

        dx = p.ode(jnp.array([2.0]), jnp.zeros(0), jnp.array([0.5]),
                   jnp.array([3.0]), 0.0)
        np.testing.assert_allclose(float(dx[0]), -3.0 * 2.0 + 0.5)

    def test_discrete_notation(self):
        p = parse_equations("x(k+1) = 0.5*x(t) + u(k)")
        assert p.discrete
        assert p.states == ["x"]

    def test_metadata(self):
        p = parse_equations("""
        dT/dt = -T(t)
        T|unit: K
        T|label: temperature
        """)
        assert p.meta["T"]["unit"] == "K"

    def test_algebraic_implicit(self):
        p = parse_equations("""
        dx/dt = -x(t) + z(t)
        0 = z(t) - 0.5*x(t)
        """)
        assert p.states == ["x"]
        assert p.algebraic == ["z"]

    def test_algebraic_count_mismatch_raises(self):
        with pytest.raises(ValueError):
            parse_equations("dx/dt = -x(t) + z(t)")

    def test_quadrature(self):
        p = parse_equations("""
        dx/dt = -x(t)
        int = x(t)**2
        """)
        assert p.n_quad == 1

    def test_time_variant_expression(self):
        import jax.numpy as jnp

        p = parse_equations("dx/dt = -x(t)*sin(t)")
        dx = p.ode(jnp.array([1.0]), jnp.zeros(0), jnp.zeros(0), jnp.zeros(0),
                   np.pi / 2)
        np.testing.assert_allclose(float(dx[0]), -1.0, atol=1e-7)


class TestModelIntegration:
    def test_model_from_dsl_simulates(self):
        m = Model(name="decay")
        m.set_equations("""
        dx/dt = -a*x(t) + u(k)
        y(k) = 2*x(t)
        """)
        assert m.n_x == 1 and m.n_u == 1 and m.n_p == 1
        m.setup(dt=0.1, integration_method="rk4")
        m.set_initial_conditions([1.0])
        out = m.simulate(u=np.zeros((10, 1)), p=np.array([1.0]), steps=10)
        np.testing.assert_allclose(out["x"][-1, 0], np.exp(-1.0), atol=1e-6)
        np.testing.assert_allclose(out["y"][-1, 0], 2 * np.exp(-1.0), atol=1e-6)

    def test_predeclared_order_respected(self):
        m = Model()
        m.set_dynamical_states(["b", "a"])
        m.set_equations("""
        da/dt = -a(t)
        db/dt = -2*b(t)
        """)
        assert m.dynamical_states == ["b", "a"]

    def test_dae_from_dsl(self):
        m = Model()
        m.set_equations("""
        dx/dt = -x(t) + z(t)
        0 = z(t) - 0.5*x(t)
        """)
        m.setup(dt=0.1, integration_method="collocation")
        m.set_initial_conditions([1.0], z0=[0.5])
        out = m.simulate(steps=5)
        np.testing.assert_allclose(out["x"][-1, 0], np.exp(-0.25), atol=1e-6)


class TestParserEdgeCases:
    def test_whitespace_and_comment_only_lines(self):
        p = parse_equations("""

        # leading comment

        dx/dt = -x(t)   # trailing comment

        """)
        assert p.states == ["x"]

    def test_unparseable_line_raises_with_context(self):
        with pytest.raises(ValueError, match="cannot parse"):
            parse_equations("dx/dt = -x(t)\nthis is not an equation")

    def test_unsupported_syntax_rejected(self):
        with pytest.raises(ValueError, match="unsupported syntax"):
            parse_equations("dx/dt = [xx for xx in range(3)][0]")

    def test_duplicate_state_equations_last_wins_or_raises(self):
        # two equations for the same state: a single consistent classification
        p = parse_equations("""
        dx/dt = -x(t)
        dy/dt = -2*y(t)
        """)
        assert p.states == ["x", "y"]

    def test_nested_derivative_notation(self):
        p = parse_equations("d(x(t))/dt = -x(t)")
        assert p.states == ["x"]

    def test_constants_not_parameters(self):
        # note: 't' and 'k' are reserved symbols (time / step index)
        p = parse_equations("""
        dx/dt = -kr*x(t) + c0
        c0 = 0.5
        """)
        assert p.parameters == ["kr"]
        assert p.constants == {"c0": 0.5}


class TestPartialDSL:
    def test_set_equations_accepts_list(self):
        from hilo_mpc_tpu import Model
        m = Model(name="lst")
        m.set_dynamical_states(["a", "b"])
        m.set_inputs("u")
        m.set_measurements("y1")
        m.set_equations(["da/dt = b", "db/dt = -a + u", "y1(k) = a"])
        m.setup(dt=0.1)
        m.set_initial_conditions([1.0, 0.0])
        out = m.simulate(u=0.0, steps=3)
        assert out["x"].shape[-1] == 2

    def test_measurement_equations_alone(self):
        # reference pattern: declare, set ODEs, then set measurements separately
        from hilo_mpc_tpu import Model
        m = Model(name="sep")
        m.set_dynamical_states("a")
        m.set_inputs("u")
        m.set_measurements("y1")
        m.set_dynamical_equations("da/dt = -a + u")
        m.set_measurement_equations("y1(k) = 2*a")
        m.setup(dt=0.1)
        m.set_initial_conditions([1.0])
        out = m.simulate(u=0.0, steps=2)
        assert np.allclose(np.asarray(out["y"])[-1],
                           2.0 * np.asarray(out["x"])[-1], atol=1e-6)

    def test_missing_state_equation_still_raises(self):
        from hilo_mpc_tpu import Model
        m = Model(name="bad")
        m.set_dynamical_states(["a", "b"])
        with pytest.raises(ValueError, match="has no equation"):
            m.set_equations(["da/dt = -a"])
