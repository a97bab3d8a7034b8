"""Linear state-space initialization breadth.

Mirrors the coverage areas of the reference's linear-systems matrix
(reference: tests/test_linear_systems.py — 22 initialization tests over
A/B/C/D declaration permutations, auto-declared variable counts,
dimension errors, and linearity/time-variance detection). All models are
2-state LTI systems simulated a handful of steps — cheap on CPU.
"""
import numpy as np
import pytest

from hilo_mpc_tpu import Model

A2 = [[0.0, 1.0], [-2.0, -0.3]]
B2 = [[0.0], [1.0]]
C2 = [[1.0, 0.0]]
D2 = [[0.5]]


def _sim(model, steps=5, u=None, x0=(1.0, 0.0)):
    model.setup(dt=0.1)
    model.set_initial_conditions(list(x0))
    kw = {} if u is None else {"u": np.full((steps, model.n_u), float(u))}
    return model.simulate(steps=steps, **kw)


# -- declaration permutations ----------------------------------------------------
def test_autonomous_a_only():
    m = Model()
    m.set_state_space(A=A2)
    assert m.n_x == 2 and m.n_u == 0
    out = _sim(m)
    assert np.all(np.isfinite(out["x"]))


def test_a_and_b_declares_inputs():
    m = Model()
    m.set_state_space(A=A2, B=B2)
    assert m.n_x == 2 and m.n_u == 1
    out = _sim(m, u=1.0)
    assert np.all(np.isfinite(out["x"]))


def test_a_b_c_declares_measurements():
    m = Model()
    m.set_state_space(A=A2, B=B2, C=C2)
    assert m.n_y == 1
    out = _sim(m, u=0.0)
    np.testing.assert_allclose(np.asarray(out["y"]).ravel(),
                               np.asarray(out["x"])[:, 0], rtol=1e-6)


def test_feedthrough_d():
    m = Model()
    m.set_state_space(A=A2, B=B2, C=C2, D=D2)
    m.setup(dt=0.1)
    m.set_initial_conditions([0.0, 0.0])
    out = m.simulate(u=np.full((3, 1), 2.0), steps=3)
    # x starts at 0: first measurement is dominated by D u = 1.0
    y = np.asarray(out["y"]).ravel()
    assert abs(y[0] - 1.0) < 0.1


def test_property_setters_declare_incrementally():
    m = Model()
    m.A = A2
    m.B = B2
    assert m.n_x == 2 and m.n_u == 1
    np.testing.assert_allclose(m.A, A2)
    np.testing.assert_allclose(m.B, B2)


def test_predeclared_names_preserved():
    m = Model()
    m.set_dynamical_states(["pos", "vel"])
    m.set_inputs("force")
    m.set_state_space(A=A2, B=B2)
    assert m.dynamical_states == ["pos", "vel"]
    assert m.inputs == ["force"]


def test_discrete_state_space():
    m = Model(discrete=True)
    m.set_state_space(A=[[0.5, 0.0], [0.0, 0.25]])
    m.setup(dt=1.0)
    m.set_initial_conditions([1.0, 1.0])
    out = m.simulate(steps=2)
    np.testing.assert_allclose(np.asarray(out["x"])[-1], [0.25, 0.0625],
                               rtol=1e-6)


# -- dimension errors -----------------------------------------------------------------
def test_nonsquare_a_raises():
    with pytest.raises(ValueError, match="square"):
        Model().set_state_space(A=np.ones((2, 3)))


def test_b_row_mismatch_raises():
    with pytest.raises(ValueError, match="rows"):
        Model().set_state_space(A=A2, B=np.ones((3, 1)))


def test_c_column_mismatch_raises():
    with pytest.raises(ValueError, match="columns"):
        Model().set_state_space(A=A2, C=np.ones((1, 3)))


def test_d_column_mismatch_raises():
    with pytest.raises(ValueError, match="columns"):
        Model().set_state_space(A=A2, B=B2, C=C2, D=np.ones((1, 2)))


def test_d_row_mismatch_raises():
    with pytest.raises(ValueError, match="rows"):
        Model().set_state_space(A=A2, B=B2, C=C2, D=np.ones((2, 1)))


# -- structural detection ----------------------------------------------------------------
def test_state_space_model_is_linear():
    m = Model()
    m.set_state_space(A=A2, B=B2)
    assert m.is_linear


def test_linear_dsl_model_is_linear():
    m = Model()
    m.set_inputs("u")
    m.set_equations("dx/dt = -2*x + 0.5*u")
    assert m.is_linear


def test_nonlinear_dsl_model_is_not_linear():
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

    assert not cstr_schaffner_and_zeitz().is_linear


def test_lti_is_not_time_variant():
    m = Model()
    m.set_state_space(A=A2, B=B2)
    assert not m.is_time_variant


def test_time_varying_dsl_detected():
    m = Model()
    m.set_equations("dx/dt = -x + sin(t)")
    assert m.is_time_variant
