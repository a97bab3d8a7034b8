"""Embedded C99 MHE (damped Gauss-Newton window solver) vs the host MHE
(interior point, AD). Same window data, same weights (Q/R/P0 covariances
inverted at export), same arrival-update convention — agreement over a
moving-window filtering run certifies the export. The reference has no
embedded estimator (its MHE is host-side CasADi/IPOPT)."""
import numpy as np
import pytest

from hilo_mpc_tpu import Model
from hilo_mpc_tpu.embedded import compile_shared, find_c_compiler
from hilo_mpc_tpu.embedded.mhe_codegen import generate_mhe_c, load_mhe
from hilo_mpc_tpu.estimation.mhe import MovingHorizonEstimator

pytestmark = pytest.mark.skipif(find_c_compiler() is None,
                                reason="no C compiler")

CSTR_DSL = """
dx_1/dt = -a_1*x_1(t) + b_1*r
dx_2/dt = -a_2*x_2(t) + b_2*r + g*u(k)
y(k) = x_2(t)
r = (1 - x_1(t))*exp(-E/(1 + x_2(t)))
"""


def _mhe(N=6):
    m = Model(name="cstr")
    m.set_equations(CSTR_DSL)
    mhe = MovingHorizonEstimator(m)
    mhe.horizon = N
    mhe.Q = 1e-3 * np.eye(2)
    mhe.R = np.array([[1e-3]])
    mhe.P0 = 0.05 * np.eye(2)
    mhe.set_initial_parameter_values([1.0] * 6)
    mhe.setup(dt=0.1, options={"tol": 1e-9, "max_iter": 60})
    mhe.set_initial_guess([0.25, 0.08])
    return mhe


def _plant_run(steps, seed=0):
    rng = np.random.default_rng(seed)
    x = np.array([0.2, 0.1])
    Us, Ys, Xs = [], [], [x.copy()]

    def ode(x, u):
        r = (1.0 - x[0]) * np.exp(-1.0 / (1.0 + x[1]))
        return np.array([-x[0] + r, -x[1] + r + u[0]])

    for k in range(steps):
        u = np.array([0.3 * np.sin(0.25 * k)])
        Ys.append([x[1] + 0.003 * rng.standard_normal()])
        k1 = ode(x, u); k2 = ode(x + 0.05 * k1, u)
        k3 = ode(x + 0.05 * k2, u); k4 = ode(x + 0.1 * k3, u)
        x = x + (0.1 / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        Us.append(u.copy())
        Xs.append(x.copy())
    return np.array(Xs), np.array(Us), np.array(Ys)


class TestEmbeddedMHE:
    def test_matches_host_mhe_over_run(self, tmp_path):
        N = 6
        mhe = _mhe(N)
        src = generate_mhe_c(mhe, str(tmp_path / "cstr_mhe.c"))
        solve_c = load_mhe(compile_shared(src), nx=2, ny=1, nu=1, N=N)

        X_true, Us, Ys = _plant_run(16)
        # host side: streaming estimate() calls
        x_host = []
        for k in range(len(Us)):
            est = mhe.estimate(y=Ys[k], u=Us[k])
            if est is not None:
                x_host.append(np.asarray(est, dtype=float))
        # C side: same windows, explicit ring buffer + arrival chain.
        # Window convention (estimation/mhe.py:390-397): node k carries y_k,
        # and the interval input k->k+1 is the u applied AFTER y_k, i.e. the
        # window of us leads the ys by one.
        x_c = []
        x_arr = np.array([0.25, 0.08])
        for k in range(N, len(Us)):
            Yw = np.vstack([Ys[k - N:k + 1]])
            Uw = np.asarray(Us[k - N + 1:k + 1])
            xe, x_arr = solve_c(Yw, Uw, x_arr, t=(k - N) * 0.1)
            x_c.append(xe)
        assert len(x_c) == len(x_host)
        np.testing.assert_allclose(np.array(x_c), np.array(x_host),
                                   atol=5e-4)
        # and it tracks the truth
        assert np.abs(x_c[-1] - X_true[len(Us)]).max() < 5e-2

    def test_rejects_estimated_params(self, tmp_path):
        m = Model(name="cstr")
        m.set_equations(CSTR_DSL)
        mhe = MovingHorizonEstimator(m)
        mhe.horizon = 4
        mhe.set_estimated_parameters(["E"])
        mhe.Q = 1e-3 * np.eye(2)
        mhe.R = np.array([[1e-3]])
        mhe.P0 = 0.05 * np.eye(2)
        mhe.set_initial_parameter_values([1.0] * 6)
        mhe.setup(dt=0.1)
        with pytest.raises(NotImplementedError, match="state estimation"):
            generate_mhe_c(mhe, str(tmp_path / "bad.c"))
