"""Regenerate the golden-parity fixtures from the ACTUAL reference stack
(hilo-mpc + CasADi/IPOPT).

This script cannot run in the build environment (casadi is not installable
there — zero egress, pinned image); it is checked in so the fixtures can be
re-derived from real IPOPT on any machine where
``pip install casadi hilo-mpc`` (or the vendored copy at /root/reference on
the build box) works:

    PYTHONPATH=/root/reference python tools/make_golden_ipopt.py

It writes tests/golden/<name>_ipopt.npz in the same schema as
tools/make_golden_fixtures.py (which uses an independent SciPy oracle instead);
tests/test_golden_parity.py prefers the ``*_ipopt.npz`` file when present, so
dropping the IPOPT-generated files in upgrades the parity test from
"independent optimizer" to "the reference's own solver" with no code change.

Configs mirror tests/golden_configs.py one-to-one (same models, horizons,
weights, bounds, initial states, plant integration) expressed in the
reference's API (reference: hilo_mpc/modules/controller/mpc.py:42-1932,
estimator/mhe.py:38-1251, library/models.py:30).
"""
import os
import sys

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

CSTR_P = [1.0] * 6
CSTR_REF = [0.3, 0.18055]
IPOPT_OPTS = {"ipopt.tol": 1e-11, "ipopt.print_level": 0, "print_time": False}


def _cstr_ode_np(x, u, p=CSTR_P):
    a1, b1, a2, b2, g, E = p
    r = (1.0 - x[0]) * np.exp(-E / (1.0 + x[1]))
    return np.array([-a1 * x[0] + b1 * r, -a2 * x[1] + b2 * r + g * u[0]])


def _rk4(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def gen_cstr_tracking():
    from hilo_mpc import NMPC
    from hilo_mpc.library.models import cstr_schaffner_and_zeitz

    model = cstr_schaffner_and_zeitz()
    model.setup(dt=0.1)
    nmpc = NMPC(model)
    nmpc.horizon = 20
    nmpc.quad_stage_cost.add_states(names=["x_1", "x_2"],
                                    weights=[10.0, 10.0], ref=CSTR_REF)
    nmpc.quad_stage_cost.add_inputs(names="u", weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_initial_guess(x_guess=[0.2, 0.1], u_guess=[0.0])
    nmpc.setup(options={"integration_method": "rk4"},
               solver_options=IPOPT_OPTS)

    x = np.array([0.2, 0.1])
    X_meas, U_gold = [x.copy()], []
    for _ in range(25):
        u = np.atleast_1d(np.asarray(
            nmpc.optimize(x, cp=CSTR_P)).ravel().astype(float))
        U_gold.append(u)
        x = _rk4(_cstr_ode_np, x, u, 0.1)
        X_meas.append(x.copy())
    np.savez(os.path.join(OUT_DIR, "cstr_tracking_ipopt.npz"),
             X_meas=np.array(X_meas), U_gold=np.array(U_gold),
             U_mine=np.array(U_gold) * np.nan, opt_meta=np.zeros((25, 3)),
             max_dev_at_generation=np.nan, source="casadi-ipopt",
             kind="nmpc")
    print("cstr_tracking_ipopt.npz written")


def gen_mhe_cstr():
    from hilo_mpc import MHE
    from hilo_mpc.library.models import cstr_schaffner_and_zeitz

    model = cstr_schaffner_and_zeitz()
    model.setup(dt=0.1)
    mhe = MHE(model)
    mhe.horizon = 8
    mhe.quad_arrival_cost.add_states(weights=np.linalg.inv(0.05 * np.eye(2)),
                                     guess=[0.25, 0.08])
    mhe.quad_stage_cost.add_measurements(weights=[1e4])
    mhe.quad_stage_cost.add_state_noise(weights=np.diag([1e3, 1e3]))
    mhe.setup(options={"integration_method": "rk4"},
              solver_options=IPOPT_OPTS)

    rng = np.random.default_rng(7)
    steps, meas_std = 22, 0.003
    x_true = np.array([0.2, 0.1])
    Us = 0.3 * np.sin(np.linspace(0.0, 5.0, steps))[:, None]
    X_true, Ys = [x_true.copy()], []
    for k in range(steps):
        Ys.append([x_true[1] + meas_std * rng.standard_normal()])
        x_true = _rk4(_cstr_ode_np, x_true, Us[k], 0.1)
        X_true.append(x_true.copy())
    Ys = np.array(Ys)

    Xest, est_steps = [], []
    for k in range(steps):
        mhe.add_measurements(Ys[k], u=Us[k])
        x_est, _ = mhe.estimate()
        if x_est is not None:
            Xest.append(np.asarray(x_est).ravel().astype(float))
            est_steps.append(k)
    np.savez(os.path.join(OUT_DIR, "mhe_cstr_ipopt.npz"),
             Ys=Ys, Us=Us, X_true=np.array(X_true),
             Xest_gold=np.array(Xest), Xest_mine=np.array(Xest) * np.nan,
             est_steps=np.array(est_steps),
             opt_meta=np.zeros((len(est_steps), 3)),
             max_dev_at_generation=np.nan, source="casadi-ipopt", kind="mhe")
    print("mhe_cstr_ipopt.npz written")


GENERATORS = {"cstr_tracking": gen_cstr_tracking, "mhe_cstr": gen_mhe_cstr}


def main():
    try:
        import casadi  # noqa: F401
    except ImportError:
        sys.exit("casadi is required: pip install casadi, and put the "
                 "reference hilo_mpc on PYTHONPATH")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in (sys.argv[1:] or list(GENERATORS)):
        GENERATORS[name]()


if __name__ == "__main__":
    main()
