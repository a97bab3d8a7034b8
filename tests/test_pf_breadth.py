"""Particle-filter breadth: custom initial-sampling pdf, annotation
validation, sample_size, linear-model warning.

Mirrors the reference's PF matrix (reference: tests/test_PFs.py — 18
tests over the probability_density_function setter's annotation checks,
transposed pdf outputs, variant/sample-size setters, and the
linear-model warning)."""
import warnings

import numpy as np
import pytest

from hilo_mpc_tpu import PF, Model
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz


def _pendulum():
    m = Model(name="pend")
    m.set_inputs("tau")
    m.set_equations("""
    dth/dt = om(t)
    dom/dt = -9.81*sin(th(t)) - 0.3*om(t) + tau(k)
    y(k) = th(t)
    """)
    return m


def _pf(**kw):
    pf = PF(_pendulum(), n_particles=40, seed=1, **kw)
    pf.setup(dt=0.05)
    pf.Q = [1e-4, 1e-4]
    pf.R = [1e-3]
    pf.set_initial_guess([0.3, 0.0], P0=np.eye(2) * 0.01)
    return pf


def test_linear_model_warns():
    m = Model()
    m.set_state_space(A=[[0.0, 1.0], [-1.0, -0.1]], B=[[0.0], [1.0]],
                      C=[[1.0, 0.0]])
    with pytest.warns(UserWarning, match="Kalman"):
        PF(m, n_particles=10)


def test_nonlinear_model_does_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        PF(cstr_schaffner_and_zeitz(), n_particles=10)


def test_default_pdf_is_lhs():
    from hilo_mpc_tpu.estimation.pf import lhsnorm

    assert _pf().probability_density_function is lhsnorm


def test_pdf_not_callable_raises():
    pf = _pf()
    with pytest.raises(TypeError, match="callable"):
        pf.probability_density_function = "not-a-function"


def test_pdf_annotations_accepted():
    pf = _pf()

    def pdf(mu: np.ndarray, sigma: np.ndarray, n: int) -> np.ndarray:
        return np.tile(mu, (n, 1))

    pf.probability_density_function = pdf
    assert pf.probability_density_function is pdf


@pytest.mark.parametrize("bad,msg", [
    (lambda: None, "first"),
    (lambda: None, "second"),
    (lambda: None, "third"),
])
def test_pdf_wrong_annotations_raise(bad, msg):
    pf = _pf()
    if msg == "first":
        def pdf(mu: int, sigma: np.ndarray, n: int) -> np.ndarray:  # noqa
            return np.zeros((1, 1))
    elif msg == "second":
        def pdf(mu: np.ndarray, sigma: float, n: int) -> np.ndarray:  # noqa
            return np.zeros((1, 1))
    else:
        def pdf(mu: np.ndarray, sigma: np.ndarray, n: str) -> np.ndarray:  # noqa
            return np.zeros((1, 1))
    with pytest.raises(TypeError, match=msg):
        pf.probability_density_function = pdf


def test_pdf_wrong_return_annotation_raises():
    pf = _pf()

    def pdf(mu: np.ndarray, sigma: np.ndarray, n: int) -> list:
        return []

    with pytest.raises(TypeError, match="return value"):
        pf.probability_density_function = pdf


def test_unannotated_pdf_used_for_init():
    pf = _pf()
    calls = {}

    def pdf(mu, sigma, n):
        calls["n"] = n
        return np.tile(np.asarray(mu), (n, 1))

    pf.probability_density_function = pdf
    pf.set_initial_guess([0.3, 0.0])
    assert calls["n"] == 40
    np.testing.assert_allclose(pf.particles, np.tile([0.3, 0.0], (40, 1)))


def test_transposed_pdf_output_accepted():
    pf = _pf()

    def pdf(mu, sigma, n):
        return np.tile(np.asarray(mu)[:, None], (1, n))  # (nx, n) layout

    pf.probability_density_function = pdf
    pf.set_initial_guess([0.3, 0.0])
    assert pf.particles.shape == (40, 2)


def test_wrong_size_pdf_output_raises():
    pf = _pf()
    pf.probability_density_function = lambda mu, sigma, n: np.zeros((7, 5))
    with pytest.raises(ValueError, match="Dimension mismatch"):
        pf.set_initial_guess([0.3, 0.0])


def test_sample_size_alias_and_validation():
    pf = _pf()
    assert pf.sample_size == 40
    pf.sample_size = 25
    assert pf.n_particles == 25
    with pytest.raises(ValueError):
        pf.sample_size = 0


def test_custom_pdf_filter_still_tracks():
    pf = _pf()

    def pdf(mu, sigma, n):
        rng = np.random.default_rng(0)
        return np.asarray(mu)[None, :] + 0.05 * rng.standard_normal((n, 2))

    pf.probability_density_function = pdf
    pf.set_initial_guess([0.35, 0.0])
    # simulate the true pendulum and feed measurements
    plant = _pendulum()
    plant.setup(dt=0.05)
    plant.set_initial_conditions([0.3, 0.0])
    out = plant.simulate(u=np.zeros((20, 1)), steps=20)
    y = np.asarray(out["y"]).reshape(-1, 1)
    x_hat = pf.estimate(y, u=np.zeros((20, 1)))
    assert abs(float(x_hat[0]) - float(np.asarray(out["x"])[-1, 0])) < 0.1
