"""Embedded C99 EKF export vs the host EKF (AD Jacobians, Joseph form).

The generated filter uses the same RK4 step and central finite-difference
Jacobians; agreement to ~1e-5 over a closed filtering run certifies the
transpiled model/measurement maps and the C linear algebra. Completes the
embedded family with the estimator side (the reference's embedded layer,
muAO-MPC, has no estimator — its filters are host-side CasADi,
hilo_mpc/modules/estimator/kf.py:328-646).
"""
import numpy as np
import pytest

from hilo_mpc_tpu import Model
from hilo_mpc_tpu.embedded import compile_shared, find_c_compiler
from hilo_mpc_tpu.embedded.ekf_codegen import (generate_ekf_c,
                                               generate_meas_c, load_ekf)
from hilo_mpc_tpu.estimation import ExtendedKalmanFilter

pytestmark = pytest.mark.skipif(find_c_compiler() is None,
                                reason="no C compiler")

CSTR_DSL = """
dx_1/dt = -a_1*x_1(t) + b_1*r
dx_2/dt = -a_2*x_2(t) + b_2*r + g*u(k)
y(k) = x_2(t)
r = (1 - x_1(t))*exp(-E/(1 + x_2(t)))
"""


def _model():
    m = Model(name="cstr")
    m.set_equations(CSTR_DSL)
    return m


def _ekf():
    ekf = ExtendedKalmanFilter(_model())
    ekf.Q = np.diag([1e-4, 2e-4])
    ekf.R = np.array([[1e-4]])
    ekf.set_initial_parameter_values([1.0] * 6)
    ekf.setup(dt=0.1)
    return ekf


class TestEmbeddedEKF:
    def test_matches_host_filter_over_run(self, tmp_path):
        ekf = _ekf()
        src = generate_ekf_c(ekf, str(tmp_path / "cstr_ekf.c"))
        step_c = load_ekf(compile_shared(src), nx=2, ny=1, nu=1)

        # host side: pure step fn (x, P, u, p, y, t) -> (x+, P+, y_pred)
        host_step = ekf.step_fn()
        p = np.ones(6)
        rng = np.random.default_rng(0)
        x_h = np.array([0.25, 0.08])
        P_h = 0.05 * np.eye(2)
        x_c, P_c = x_h.copy(), P_h.copy()
        x_true = np.array([0.2, 0.1])

        def plant(x, u):
            def ode(x):
                r = (1.0 - x[0]) * np.exp(-1.0 / (1.0 + x[1]))
                return np.array([-x[0] + r, -x[1] + r + u[0]])
            k1 = ode(x); k2 = ode(x + 0.05 * k1)
            k3 = ode(x + 0.05 * k2); k4 = ode(x + 0.1 * k3)
            return x + (0.1 / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        for k in range(30):
            u = np.array([0.3 * np.sin(0.2 * k)])
            x_true = plant(x_true, u)
            y = np.array([x_true[1] + 0.002 * rng.standard_normal()])
            xh, Ph, _ = host_step(x_h, P_h, u, p, y, k * 0.1)
            x_h, P_h = np.asarray(xh), np.asarray(Ph)
            x_c, P_c = step_c(x_c, P_c, u, y, t=k * 0.1)
            np.testing.assert_allclose(x_c, x_h, atol=2e-5)
            np.testing.assert_allclose(P_c, P_h, atol=2e-5)
        # and the filter actually tracks the truth
        assert np.abs(x_h - x_true).max() < 2e-2

    def test_meas_body_transpile(self):
        body = generate_meas_c(_model())
        assert "y[0]" in body and "x[1]" in body

    def test_requires_dsl_measurements(self, tmp_path):
        m = Model(name="nomeas")
        m.set_dynamical_states("x")
        m.set_dynamical_equations(lambda x: -x)
        ekf = ExtendedKalmanFilter(m)
        ekf.setup(dt=0.1)
        with pytest.raises(ValueError, match="DSL|equation-string"):
            generate_ekf_c(ekf, str(tmp_path / "bad.c"))

    def test_covariance_stays_spd(self, tmp_path):
        ekf = _ekf()
        src = generate_ekf_c(ekf, str(tmp_path / "cstr_ekf2.c"))
        step_c = load_ekf(compile_shared(src), nx=2, ny=1, nu=1)
        x, P = np.array([0.2, 0.1]), 0.1 * np.eye(2)
        for k in range(50):
            x, P = step_c(x, P, np.array([0.0]),
                          np.array([0.1 + 0.01 * np.sin(k)]), t=0.1 * k)
        w = np.linalg.eigvalsh(P)
        assert w.min() > 0
        np.testing.assert_allclose(P, P.T, atol=1e-14)
