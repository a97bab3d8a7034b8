"""Linear-system declaration paths (reference tier: tests/test_linear_systems.py —
state-space <-> ODE paths, 22 tests) + new Model analysis helpers."""
import numpy as np
import pytest
import scipy.linalg

from hilo_mpc_tpu import Model

A = np.array([[0.0, 1.0], [-2.0, -0.5]])
B = np.array([[0.0], [1.0]])
C = np.array([[1.0, 0.0]])
D = np.array([[0.5]])


class TestStateSpacePaths:
    def test_continuous_ss_simulation_matches_expm(self):
        m = Model()
        m.set_state_space(A=A, B=B, C=C)
        m.setup(dt=0.05, integration_method="rk4")
        m.set_initial_conditions([1.0, -0.3])
        out = m.simulate(steps=40)
        x_exact = scipy.linalg.expm(A * 2.0) @ np.array([1.0, -0.3])
        np.testing.assert_allclose(out["x"][-1], x_exact, atol=1e-6)

    def test_forced_response(self):
        m = Model()
        m.set_state_space(A=A, B=B, C=C)
        m.setup(dt=0.05, integration_method="rk4")
        m.set_initial_conditions([0.0, 0.0])
        out = m.simulate(u=np.ones((40, 1)), steps=40)
        # steady state: -A^{-1} B u
        x_ss = -np.linalg.solve(A, B @ np.ones(1))
        M = np.zeros((3, 3))
        M[:2, :2] = A
        M[:2, 2:] = B
        E = scipy.linalg.expm(M * 2.0)
        x_exact = E[:2, 2]
        np.testing.assert_allclose(out["x"][-1], x_exact, atol=1e-6)

    def test_measurement_with_feedthrough(self):
        m = Model()
        m.set_state_space(A=A, B=B, C=C, D=D)
        m.setup(dt=0.1, integration_method="rk4")
        m.set_initial_conditions([1.0, 0.0])
        out = m.simulate(u=np.array([[2.0]]), steps=1)
        np.testing.assert_allclose(out["y"][-1],
                                   C @ out["x"][-1] + D @ [2.0], atol=1e-8)

    def test_matrix_properties_roundtrip(self):
        m = Model()
        m.set_state_space(A=A, B=B, C=C, D=D)
        np.testing.assert_allclose(m.A, A)
        np.testing.assert_allclose(m.B, B)
        np.testing.assert_allclose(m.C, C)
        np.testing.assert_allclose(m.D, D)

    def test_discrete_ss(self):
        Ad = np.array([[0.9, 0.1], [0.0, 0.8]])
        m = Model(discrete=True)
        m.set_state_space(A=Ad, B=[[0.0], [1.0]])
        m.setup(dt=1.0)
        m.set_initial_conditions([1.0, 1.0])
        out = m.simulate(steps=3)
        np.testing.assert_allclose(out["x"][-1],
                                   np.linalg.matrix_power(Ad, 3) @ [1.0, 1.0],
                                   atol=1e-7)

    def test_ode_matches_state_space(self):
        import jax.numpy as jnp

        m1 = Model()
        m1.set_state_space(A=A, B=B)
        m2 = Model()
        m2.set_dynamical_states(2)
        m2.set_inputs(1)
        m2.set_dynamical_equations(
            lambda x, u: jnp.asarray(A) @ x + jnp.asarray(B) @ u)
        for m in (m1, m2):
            m.setup(dt=0.1, integration_method="rk4")
            m.set_initial_conditions([1.0, 0.5])
        o1 = m1.simulate(u=np.full((10, 1), 0.3), steps=10)
        o2 = m2.simulate(u=np.full((10, 1), 0.3), steps=10)
        # f32 default model dtype: agreement to single-precision roundoff
        np.testing.assert_allclose(o1["x"], o2["x"], atol=1e-5)


class TestEquilibrium:
    def test_valid_equilibrium_accepted(self):
        m = Model()
        m.set_state_space(A=A, B=B)
        m.set_equilibrium_point([0.0, 0.0], [0.0])

    def test_invalid_equilibrium_raises(self):
        m = Model()
        m.set_state_space(A=A, B=B)
        with pytest.raises(ValueError, match="not an equilibrium"):
            m.set_equilibrium_point([1.0, 1.0], [0.0])

    def test_forced_equilibrium(self):
        # x_ss = -A^{-1} B u for u = 1
        m = Model()
        m.set_state_space(A=A, B=B)
        x_ss = -np.linalg.solve(A, B @ np.ones(1))
        m.set_equilibrium_point(x_ss, [1.0])


class TestTrajectoryLinearization:
    def test_linearize_trajectory_shapes_and_values(self):
        import jax.numpy as jnp

        m = Model()
        m.set_dynamical_states(2)
        m.set_inputs(1)
        m.set_dynamical_equations(
            lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) + u[0]]))
        m.setup(dt=0.1)
        X = np.array([[0.0, 0.0], [np.pi / 2, 0.1]])
        U = np.zeros((2, 1))
        A_k, B_k = m.linearize_trajectory(X, U)
        assert A_k.shape == (2, 2, 2) and B_k.shape == (2, 2, 1)
        np.testing.assert_allclose(A_k[0], [[0, 1], [-1, 0]], atol=1e-7)
        np.testing.assert_allclose(A_k[1], [[0, 1], [0, 0]], atol=1e-7)
