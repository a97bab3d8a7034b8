"""Model declaration / simulation / linearization tests (SURVEY.md §4 tiers (a)+(b))."""
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import Model


def make_msd():
    """Mass-spring-damper: x'' = -k x - c x' + u."""
    model = Model(name="msd")
    model.set_dynamical_states(["pos", "vel"])
    model.set_inputs(["force"])
    model.set_parameters(["k", "c"])
    model.set_dynamical_equations(
        lambda x, u, p: jnp.array([x[1], -p[0] * x[0] - p[1] * x[1] + u[0]]))
    return model


class TestDeclaration:
    def test_dims(self):
        m = make_msd()
        assert (m.n_x, m.n_u, m.n_p, m.n_z) == (2, 1, 2, 0)
        assert m.dynamical_states == ["pos", "vel"]

    def test_int_declaration_names(self):
        m = Model()
        m.set_dynamical_states(3)
        assert m.dynamical_states == ["x_0", "x_1", "x_2"]

    def test_named_vector_declaration(self):
        # reference forms: set_dynamical_states('T', 3) and (3, 'T')
        # (reference: dynamic_model.py:793-807)
        m = Model()
        m.set_dynamical_states("T", 3)
        m.set_inputs(2, "q")
        m.set_parameters("k", 1)
        assert m.dynamical_states == ["T_0", "T_1", "T_2"]
        assert m.inputs == ["q_0", "q_1"]
        assert m.parameters == ["k"]

    def test_named_vector_declaration_in_dsl(self):
        # generated element names are plain DSL identifiers
        m = Model(discrete=True)
        m.set_dynamical_states("s", 2)
        m.set_equations(ode=["s_0(k+1) = s_0 + 0.1*s_1", "s_1(k+1) = 0.9*s_1"])
        m.setup(dt=1.0)
        m.set_initial_conditions([1.0, 1.0])
        out = m.simulate(steps=1)["x"][-1]
        np.testing.assert_allclose(out, [1.1, 0.9], rtol=1e-6)

    def test_bad_vector_declaration_raises(self):
        with pytest.raises(TypeError):
            Model().set_dynamical_states("a", "b")
        with pytest.raises(ValueError):
            Model().set_dynamical_states("a", -1)

    def test_duplicate_names_raise(self):
        m = Model()
        with pytest.raises(ValueError):
            m.set_dynamical_states(["a", "a"])

    def test_setup_without_equations_raises(self):
        with pytest.raises(RuntimeError):
            Model().setup(dt=0.1)

    def test_default_measurement_is_state(self):
        m = make_msd()
        assert m.n_y == 2
        assert m.measurements == ["pos", "vel"]


class TestSimulation:
    def test_simulate_matches_exact_decay(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x)
        m.setup(dt=0.1, integration_method="rk4")
        m.set_initial_conditions([1.0])
        out = m.simulate(steps=10)
        np.testing.assert_allclose(out["x"][-1, 0], np.exp(-1.0), atol=1e-6)
        # solution storage accumulated 11 samples (initial + 10 steps)
        assert m.solution.n_samples == 11
        np.testing.assert_allclose(m.solution["x:f"][0], np.exp(-1.0), atol=1e-6)

    def test_simulate_with_inputs_and_params(self):
        m = make_msd()
        m.setup(dt=0.05, integration_method="rk4")
        m.set_initial_conditions([1.0, 0.0])
        m.set_initial_parameter_values([1.0, 0.0])  # undamped oscillator
        out = m.simulate(u=np.zeros((200, 1)), steps=200)
        # x(t) = cos(t) at t = 10
        np.testing.assert_allclose(out["x"][-1, 0], np.cos(10.0), atol=1e-4)

    def test_batched_simulate(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x)
        m.setup(dt=0.1)
        x0 = np.linspace(1.0, 4.0, 8).reshape(8, 1)
        out = m.simulate(x0=x0, steps=5)
        assert out["x"].shape == (8, 5, 1)
        np.testing.assert_allclose(out["x"][:, -1, 0], x0[:, 0] * np.exp(-0.5),
                                   rtol=1e-6)

    def test_batched_simulate_per_scenario_u(self):
        # reference semantics: simulate honors the u it is given per call
        # (dynamic_model.py:3942-3990); batched path accepts (B, steps, n_u)
        m = Model()
        m.set_dynamical_states("x")
        m.set_inputs("u")
        m.set_dynamical_equations(lambda x, u: -x + u)
        m.setup(dt=0.1, integration_method="rk4")
        B, steps = 6, 4
        x0 = np.zeros((B, 1))
        U = np.linspace(-1.0, 1.0, B).reshape(B, 1, 1) * np.ones((B, steps, 1))
        out = m.simulate(x0=x0, u=U, steps=steps)
        assert out["x"].shape == (B, steps, 1)
        # each scenario relaxes toward its own constant input level
        expected = U[:, 0, 0] * (1.0 - np.exp(-0.1 * steps))
        np.testing.assert_allclose(out["x"][:, -1, 0], expected, atol=1e-5)
        # (B, n_u) held over all steps gives the same trajectories
        out2 = m.simulate(x0=x0, u=U[:, 0, :], steps=steps)
        np.testing.assert_allclose(out2["x"], out["x"], rtol=1e-12)
        # shape errors are caught eagerly
        with np.testing.assert_raises(ValueError):
            m.simulate(x0=x0, u=np.zeros((B, steps + 1, 1)), steps=steps)

    def test_batched_simulate_per_scenario_p(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_parameters("k")
        m.set_dynamical_equations(lambda x, p: -p * x)
        m.setup(dt=0.1, integration_method="rk4")
        B, steps = 5, 10
        x0 = np.ones((B, 1))
        K = np.linspace(0.5, 2.5, B).reshape(B, 1)
        out = m.simulate(x0=x0, p=K, steps=steps)
        np.testing.assert_allclose(out["x"][:, -1, 0], np.exp(-K[:, 0]),
                                   atol=1e-4)
        # shared p still works alongside per-scenario x0
        out_shared = m.simulate(x0=x0, p=[1.0], steps=steps)
        np.testing.assert_allclose(out_shared["x"][:, -1, 0],
                                   np.full(B, np.exp(-1.0)), atol=1e-6)

    def test_discrete_model(self):
        m = Model(discrete=True)
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: 0.5 * x)
        m.setup(dt=1.0)
        m.set_initial_conditions([8.0])
        out = m.simulate(steps=3)
        np.testing.assert_allclose(out["x"][-1, 0], 1.0)

    def test_quadrature_accumulates(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -0.0 * x)
        m.set_quadrature_functions(lambda x, t: jnp.atleast_1d(2.0 * jnp.ones(())))
        m.setup(dt=0.25, integration_method="rk4")
        m.set_initial_conditions([0.0])
        out = m.simulate(steps=1)
        np.testing.assert_allclose(out["q"][-1, 0], 0.5, atol=1e-10)

    def test_dae_simulation(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_algebraic_states("zv")
        m.set_dynamical_equations(lambda x, z: -x + z)
        m.set_algebraic_equations(lambda x, z: z - 0.5 * x)
        m.setup(dt=0.1, integration_method="collocation")
        m.set_initial_conditions([1.0], z0=[0.5])
        out = m.simulate(steps=10)
        # effective dynamics x' = -0.5 x
        np.testing.assert_allclose(out["x"][-1, 0], np.exp(-0.5), atol=1e-6)
        np.testing.assert_allclose(out["z"][-1, 0], 0.5 * out["x"][-1, 0], atol=1e-8)


class TestStateSpace:
    def test_linear_declaration(self):
        m = Model()
        m.set_state_space(A=[[0.0, 1.0], [-2.0, -0.5]], B=[[0.0], [1.0]],
                          C=[[1.0, 0.0]])
        assert m.n_x == 2 and m.n_u == 1 and m.n_y == 1
        assert m.is_linear

    def test_nonlinear_detected(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x ** 2)
        assert not m.is_linear

    def test_time_variance_detected(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x, u, p, t: -x * jnp.sin(t))
        assert m.is_time_variant
        m2 = Model()
        m2.set_dynamical_states("x")
        m2.set_dynamical_equations(lambda x: -x)
        assert not m2.is_time_variant


class TestLinearize:
    def test_linearize_pendulum(self):
        m = Model()
        m.set_dynamical_states(["th", "om"])
        m.set_inputs("tau")
        m.set_dynamical_equations(
            lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) + u[0]]))
        lin = m.linearize(x_eq=[0.0, 0.0], u_eq=[0.0])
        np.testing.assert_allclose(lin.A, [[0.0, 1.0], [-1.0, 0.0]], atol=1e-7)
        np.testing.assert_allclose(lin.B, [[0.0], [1.0]], atol=1e-7)
        assert lin.is_linear

    def test_jacobians(self):
        m = make_msd()
        A, B = m.jacobians(np.zeros(2), np.zeros(1), p=np.array([3.0, 0.7]))
        np.testing.assert_allclose(np.asarray(A), [[0, 1], [-3.0, -0.7]], atol=1e-6)


class TestDiscretizeCopyPickle:
    def test_discretize(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x)
        d = m.discretize(method="rk4")
        assert d.discrete
        d.setup(dt=0.1)
        d.set_initial_conditions([1.0])
        out = d.simulate(steps=10)
        np.testing.assert_allclose(out["x"][-1, 0], np.exp(-1.0), atol=1e-6)

    def test_copy_independent(self):
        m = make_msd()
        c = m.copy()
        c.set_dynamical_states(["a", "b", "c"])
        assert m.n_x == 2 and c.n_x == 3

    def test_pickle_roundtrip(self):
        # DSL-defined models pickle by re-parsing their source on load
        import pickle

        m = Model(name="dec")
        m.set_equations("dx/dt = -a*x(t) + u(k)")
        m.setup(dt=0.1)
        m2 = pickle.loads(pickle.dumps(m))
        assert not m2.is_setup()
        assert m2.dynamical_states == ["x"]
        m2.setup(dt=0.1)
        m2.set_initial_conditions([1.0])
        m2.set_initial_parameter_values([1.0])
        out = m2.simulate(steps=10)
        np.testing.assert_allclose(out["x"][-1, 0], np.exp(-1.0), atol=1e-6)


class TestSeriesOps:
    def test_simulate_store_false_leaves_solution_untouched(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x)
        m.setup(dt=0.1)
        m.set_initial_conditions([1.0])
        n0 = m.solution.n_samples
        m.simulate(x0=[1.0], steps=5, store=False)
        assert m.solution.n_samples == n0

    def test_timeseries_sort_append_copy(self):
        from hilo_mpc_tpu.core.series import TimeSeries

        ts = TimeSeries()
        ts.register("x", ["a"])
        ts.append([0.2, 0.0, 0.1], x=np.array([[2.0, 0.0, 1.0]]))
        ts.sort("t")
        np.testing.assert_allclose(ts["t"], [0.0, 0.1, 0.2])
        np.testing.assert_allclose(ts["a"].ravel(), [0.0, 1.0, 2.0])
        ts2 = ts.copy()
        ts2.append(0.3, x=[3.0])
        assert ts.n_samples == 3 and ts2.n_samples == 4
        ts.append(0.3, x=[3.0])
        merged = ts.copy()
        merged.append(0.4, x=[4.0])
        assert merged.n_samples == 5
