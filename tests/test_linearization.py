"""Linearization workflow tests mirrored from the reference
(reference: tests/test_linearization.py — deferred equilibrium points,
already-linear no-ops, discretize/linearize ordering, validation errors)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import Model


def pendulum():
    # forced damped pendulum; equilibrium at x = [pi/2, 0], u = sin(pi/2) = 1
    m = Model(name="pend")
    m.set_dynamical_states(["phi", "omega"])
    m.set_inputs("tau")
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) - 0.2 * x[1] + u[0]]))
    return m


X_EQ = [np.pi / 2, 0.0]
U_EQ = [1.0]


class TestAlreadyLinear:
    def test_linear_ode_returns_self(self, capsys):
        m = Model(name="lin")
        m.set_dynamical_states(["a", "b"])
        m.set_inputs("u")
        m.set_dynamical_equations(
            lambda x, u: jnp.array([2 * x[0] + 2 * x[1], 2 * x[0] - 2 * x[1]]))
        out = m.linearize()
        assert out is m
        assert "already linear" in capsys.readouterr().out

    def test_state_space_model_returns_self(self, capsys):
        m = Model(name="ss")
        m.set_state_space(A=np.array([[2.0, 2.0], [2.0, -2.0]]))
        assert m.linearize() is m
        assert "already linear" in capsys.readouterr().out

    def test_already_linearized_returns_self(self, capsys):
        lin = pendulum().linearize(x_eq=X_EQ, u_eq=U_EQ)
        out = lin.linearize()
        assert out is lin
        assert "already linearized" in capsys.readouterr().out


class TestDeferredEquilibrium:
    def test_simulate_before_equilibrium_raises(self):
        lin = pendulum().linearize()
        lin.setup(dt=0.01)
        lin.set_initial_conditions([0.0, 0.0])
        with pytest.raises(RuntimeError, match="equilibrium"):
            lin.simulate(u=0.1, steps=1)

    def test_equilibrium_finalizes_matrices(self):
        lin = pendulum().linearize()
        lin.setup(dt=0.01)
        lin.set_equilibrium_point(x_eq=X_EQ, u_eq=U_EQ)
        direct = pendulum().linearize(x_eq=X_EQ, u_eq=U_EQ)
        np.testing.assert_allclose(lin.A, direct.A, atol=1e-7)
        np.testing.assert_allclose(lin.B, direct.B, atol=1e-7)
        # A at phi = pi/2: d(-sin)/dphi = -cos(pi/2) = 0
        np.testing.assert_allclose(lin.A, [[0.0, 1.0], [0.0, -0.2]], atol=1e-6)
        lin.set_initial_conditions([0.05, 0.0])
        out = lin.simulate(u=np.zeros((5, 1)), steps=5)
        assert np.all(np.isfinite(out["x"]))

    def test_non_equilibrium_point_rejected(self):
        lin = pendulum().linearize()
        lin.setup(dt=0.01)
        with pytest.raises(ValueError, match="not an equilibrium"):
            lin.set_equilibrium_point(x_eq=[0.3, 0.1], u_eq=[0.0])

    def test_wrong_dimensions_x(self):
        lin = pendulum().linearize()
        with pytest.raises(ValueError, match="x_eq"):
            lin.set_equilibrium_point(x_eq=[0.0, 0.0, 0.0], u_eq=U_EQ)

    def test_wrong_dimensions_u(self):
        lin = pendulum().linearize()
        with pytest.raises(ValueError, match="u_eq"):
            lin.set_equilibrium_point(x_eq=X_EQ, u_eq=[1.0, 2.0])


class TestOrdering:
    """Linearize-then-discretize vs discretize-then-linearize agree for
    small dt (reference: test_linearization.py:276-300)."""

    def test_paths_agree_in_closed_loop(self):
        dt = 0.01
        # path A: linearize continuous model, integrate linear ODE
        lin = pendulum().linearize(x_eq=X_EQ, u_eq=U_EQ)
        lin.setup(dt=dt)
        # path B: discretize nonlinear model, linearize the discrete map
        disc = pendulum().discretize("rk4", dt=dt)
        disc.setup(dt=dt)
        dlin = disc.linearize(x_eq=X_EQ, u_eq=U_EQ)
        dlin.setup(dt=dt)

        d0 = np.array([0.05, 0.0])  # deviation coordinates
        for m in (lin, dlin):
            m.set_initial_conditions(d0)
        oa = lin.simulate(u=np.zeros((20, 1)), steps=20)
        ob = dlin.simulate(u=np.zeros((20, 1)), steps=20)
        np.testing.assert_allclose(oa["x"][-1], ob["x"][-1], atol=1e-5)

    def test_discrete_linearization_matches_expm(self):
        from scipy.linalg import expm

        dt = 0.05
        disc = pendulum().discretize("rk4", dt=dt)
        disc.setup(dt=dt)
        dlin = disc.linearize(x_eq=X_EQ, u_eq=U_EQ)
        Ac = np.array([[0.0, 1.0], [0.0, -0.2]])
        np.testing.assert_allclose(dlin.A, expm(Ac * dt), atol=1e-7)


class TestLinearizedModelUse:
    def test_feeds_lqr(self):
        from hilo_mpc_tpu import LQR

        lin = pendulum().linearize(x_eq=X_EQ, u_eq=U_EQ)
        dlin = lin.discretize("rk4", dt=0.05)
        dlin.setup(dt=0.05)
        lqr = LQR(dlin)
        lqr.Q = np.eye(2)
        lqr.R = np.eye(1)
        lqr.horizon = 50
        lqr.setup()
        d = np.array([0.2, 0.0])
        for _ in range(60):
            u = np.atleast_1d(np.asarray(lqr.call(d)))
            d = dlin.A @ d + dlin.B @ u  # x+ = A d + B u in deviation coords
        np.testing.assert_allclose(d, [0.0, 0.0], atol=1e-3)

    def test_pickle_roundtrip_finalized(self):
        import pickle

        lin = pendulum().linearize()
        lin.set_equilibrium_point(x_eq=X_EQ, u_eq=U_EQ)
        lin2 = pickle.loads(pickle.dumps(lin))
        np.testing.assert_allclose(lin2.A, lin.A, atol=1e-12)
