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


# ---------------------------------------------------------------------------
# Direct CasADi+IPOPT generators for the remaining configs.
#
# The two generators above drive the reference's own controller classes; the
# ones below build the SAME multiple-shooting NLPs as tests/golden_configs.py
# directly in casadi symbols and hand them to IPOPT (the reference does the
# identical reduction before calling IPOPT, mpc.py:1133-1787), which avoids
# re-expressing every advanced option through the reference API. Either way
# the provenance is real IPOPT at tol 1e-11.
#
# Not generated here (documented skips):
#   dae_colloc  — the framework's NLP embeds its fixed-iteration Newton
#                 collocation operator inside the dynamics; a casadi
#                 rootfinder/IDAS discretization is a DIFFERENT NLP, so the
#                 comparison would measure integrator mismatch, not solver
#                 correctness. The SciPy oracle solves the identical operator.
#   smpc_chance — the surrogate dynamics embed GP posterior mean/variance and
#                 covariance propagation; reproducing them symbolically in
#                 casadi is a subproject. SciPy-oracle tier stands.
# ---------------------------------------------------------------------------


def _ipopt_ms_solve(f_disc, N, nx, nu, stage_cost, term_cost,
                    lbx, ubx, lbu, ubu, x0, U_init=None, eq_term=None):
    """Multiple-shooting NLP -> IPOPT. f_disc/stage_cost/term_cost take casadi
    SX (x, u); eq_term: optional fn(xN) -> SX vector pinned to 0."""
    import casadi as ca

    X = ca.SX.sym("X", nx, N + 1)
    U = ca.SX.sym("U", nu, N)
    g, lbg, ubg = [], [], []
    J = 0
    g.append(X[:, 0] - ca.DM(x0))
    lbg += [0.0] * nx
    ubg += [0.0] * nx
    for k in range(N):
        J = J + stage_cost(X[:, k], U[:, k], k)
        g.append(X[:, k + 1] - f_disc(X[:, k], U[:, k], k))
        lbg += [0.0] * nx
        ubg += [0.0] * nx
    J = J + term_cost(X[:, N])
    if eq_term is not None:
        e = eq_term(X[:, N])
        g.append(e)
        lbg += [0.0] * e.numel()
        ubg += [0.0] * e.numel()
    w = ca.vertcat(ca.vec(X), ca.vec(U))
    lbw = np.concatenate([np.tile(np.asarray(lbx, float), N + 1).reshape(-1),
                          np.tile(np.asarray(lbu, float), N).reshape(-1)])
    ubw = np.concatenate([np.tile(np.asarray(ubx, float), N + 1).reshape(-1),
                          np.tile(np.asarray(ubu, float), N).reshape(-1)])
    prob = {"x": w, "f": J, "g": ca.vertcat(*g)}
    solver = ca.nlpsol("s", "ipopt", prob, IPOPT_OPTS)
    U0 = np.zeros((nu, N)) if U_init is None else np.asarray(U_init).T
    X0g = np.tile(np.asarray(x0, float)[:, None], (1, N + 1))
    w0 = np.concatenate([X0g.reshape(-1, order="F"),
                         U0.reshape(-1, order="F")])
    sol = solver(x0=w0, lbx=lbw, ubx=ubw, lbg=lbg, ubg=ubg)
    wv = np.asarray(sol["x"]).ravel()
    Xs = wv[:nx * (N + 1)].reshape(nx, N + 1, order="F").T
    Us = wv[nx * (N + 1):].reshape(nu, N, order="F").T
    return Xs, Us, float(sol["f"]), solver.stats()["success"]


def _cstr_rk4_ca(dt=0.1):
    import casadi as ca

    def ode(x, u):
        a1, b1, a2, b2, gg, E = CSTR_P
        r = (1.0 - x[0]) * ca.exp(-E / (1.0 + x[1]))
        return ca.vertcat(-a1 * x[0] + b1 * r,
                          -a2 * x[1] + b2 * r + gg * u[0])

    def step(x, u, k):
        k1 = ode(x, u)
        k2 = ode(x + 0.5 * dt * k1, u)
        k3 = ode(x + 0.5 * dt * k2, u)
        k4 = ode(x + dt * k3, u)
        return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    return step


def _save_nmpc(name, X_meas, U_gold):
    steps = len(U_gold)
    np.savez(os.path.join(OUT_DIR, f"{name}_ipopt.npz"),
             X_meas=np.array(X_meas), U_gold=np.array(U_gold),
             U_mine=np.array(U_gold) * np.nan, opt_meta=np.zeros((steps, 3)),
             max_dev_at_generation=np.nan, source="casadi-ipopt",
             kind="nmpc")
    print(f"{name}_ipopt.npz written")


def gen_softcon_active():
    """Mirror golden_configs.build_softcon_active: CSTR tracking, soft state
    bound x_1 <= 0.27 as the relu^2 penalty (weight 500), the setpoint above
    the bound so the penalty is active at steady state."""
    import casadi as ca

    step = _cstr_rk4_ca()
    N, W = 15, 500.0

    def stage(x, u, k):
        e = x - ca.DM(CSTR_REF)
        pen = ca.fmax(x[0] - 0.27, 0.0)
        return 10.0 * e[0] ** 2 + 10.0 * e[1] ** 2 + 0.1 * u[0] ** 2 \
            + W * pen ** 2

    x = np.array([0.2, 0.1])
    X_meas, U_gold, U_ws = [x.copy()], [], None
    for _ in range(25):
        Xs, Us, _, ok = _ipopt_ms_solve(
            step, N, 2, 1, stage, lambda xN: 0,
            lbx=[-np.inf] * 2, ubx=[np.inf] * 2, lbu=[-5.0], ubu=[5.0],
            x0=x, U_init=U_ws)
        assert ok
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0].copy())
        x = _rk4(_cstr_ode_np, x, Us[0], 0.1)
        X_meas.append(x.copy())
    _save_nmpc("softcon_active", X_meas, U_gold)


def gen_lmpc_di():
    """Mirror golden_configs.build_lmpc_di: discrete double integrator LMPC."""
    import casadi as ca

    dt = 0.1
    A = np.array([[1.0, dt], [0.0, 1.0]])
    Bm = np.array([[0.5 * dt ** 2], [dt]])
    Q, R, P = np.diag([2.0, 0.5]), np.array([[0.1]]), np.diag([8.0, 2.0])
    N = 15

    def step(x, u, k):
        return ca.DM(A) @ x + ca.DM(Bm) @ u

    def stage(x, u, k):
        return ca.bilin(ca.DM(Q), x, x) + ca.bilin(ca.DM(R), u, u)

    def term(xN):
        return ca.bilin(ca.DM(P), xN, xN)

    x = np.array([1.5, 0.0])
    X_meas, U_gold, U_ws = [x.copy()], [], None
    for _ in range(25):
        Xs, Us, _, ok = _ipopt_ms_solve(
            step, N, 2, 1, stage, term,
            lbx=[-np.inf, -0.6], ubx=[np.inf, 0.6], lbu=[-0.8], ubu=[0.8],
            x0=x, U_init=U_ws)
        assert ok
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0].copy())
        x = A @ x + Bm @ Us[0]
        X_meas.append(x.copy())
    _save_nmpc("lmpc_di", X_meas, U_gold)


def gen_pathfollow_soft():
    """Mirror golden_configs.build_pathfollow_soft: kinematic point, path
    state theta' = u_pf with path (th, sin th), soft band py <= 0.7.
    Solver coordinates: x = [px, py, th], u = [vx, vy, u_pf]."""
    import casadi as ca

    dt, N = 0.1, 12

    def step(x, u, k):
        # point kinematics exact; path state forward-Euler like the
        # framework's augmentation (theta_next = theta + h*u_pf)
        return ca.vertcat(x[0] + dt * u[0], x[1] + dt * u[1],
                          x[2] + dt * u[2])

    def stage(x, u, k):
        rx, ry = x[2], ca.sin(x[2])
        return 20.0 * (x[0] - rx) ** 2 + 20.0 * (x[1] - ry) ** 2 \
            + 0.05 * u[0] ** 2 + 0.05 * u[1] ** 2 \
            + 1.0 * (u[2] - 1.0) ** 2 \
            + 50.0 * ca.fmax(x[1] - 0.7, 0.0) ** 2

    x = np.array([0.0, 0.0, 0.0])
    X_meas, U_gold, U_ws = [x[:2].copy()], [], None
    th = 0.0
    for _ in range(25):
        Xs, Us, _, ok = _ipopt_ms_solve(
            step, N, 3, 3, stage, lambda xN: 0,
            lbx=[-np.inf, -np.inf, -np.inf], ubx=[np.inf] * 3,
            lbu=[-2.0, -2.0, 0.0], ubu=[2.0, 2.0, 2.0],
            x0=np.concatenate([x[:2], [th]]), U_init=U_ws)
        assert ok
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0, :2].copy())
        th = float(Xs[1, 2])
        x = np.concatenate([x[:2] + dt * Us[0, :2], [th]])
        X_meas.append(x[:2].copy())
    _save_nmpc("pathfollow_soft", X_meas, U_gold)


def gen_mintime():
    """Mirror golden_configs.build_mintime: double-integrator minimum time.
    Solver coordinates: x = [p, v, tau], u = [a, v_tau]; h = tau + v_tau;
    terminal equality [p, v] = 0; dt-carrying state bounded [0.02, 0.6]."""
    import casadi as ca

    N = 16

    def step(x, u, k):
        h = x[2] + u[1]
        # rk4 on [p' = v, v' = a] with step h
        p, v, a = x[0], x[1], u[0]
        # linear dynamics: exact rk4 = analytic for double integrator
        p_n = p + h * v + 0.5 * h ** 2 * a
        v_n = v + h * a
        return ca.vertcat(p_n, v_n, h)

    def stage(x, u, k):
        return 1.0 * (x[2] + u[1])          # minimize sum of dt

    rng = np.random.default_rng(11)
    x_seq = np.stack([
        np.array([-1.0, 0.0]) + np.array([0.25, 0.15]) *
        rng.standard_normal(2) for _ in range(22)])
    X_meas, U_gold, U_ws = [x_seq[0].copy()], [], None
    for k, xs in enumerate(x_seq):
        if k:
            X_meas.append(xs.copy())
        Xs, Us, _, ok = _ipopt_ms_solve(
            step, N, 3, 2, stage, lambda xN: 0,
            lbx=[-np.inf, -np.inf, 0.02], ubx=[np.inf, np.inf, 0.6],
            lbu=[-1.0, -np.inf], ubu=[1.0, np.inf],
            x0=np.concatenate([xs, [0.2]]), U_init=U_ws,
            eq_term=lambda xN: ca.vertcat(xN[0], xN[1]))
        assert ok
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0, :1].copy())
    _save_nmpc("mintime", X_meas, U_gold)


def gen_hybrid_ann():
    """Mirror golden_configs.build_hybrid_ann: CSTR with E predicted by the
    frozen MLP. Requires this repo importable (weights come from the same
    seeded construction)."""
    import casadi as ca

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from golden_configs import _fixed_ann, build_hybrid_ann  # noqa: F401

    ann = _fixed_ann()
    Ws = [(np.asarray(l["W"]), np.asarray(l["b"])) for l in ann._params]
    dt, N = 0.1, 15

    def ann_E(x):
        h = ca.vertcat(x[0], x[1]).T
        for W, b in Ws[:-1]:
            h = ca.tanh(h @ ca.DM(W) + ca.DM(b).T)
        W, b = Ws[-1]
        return (h @ ca.DM(W) + ca.DM(b).T)[0, 0]

    def ode(x, u):
        a1, b1, a2, b2, gg, _ = CSTR_P
        E = ann_E(x)
        r = (1.0 - x[0]) * ca.exp(-E / (1.0 + x[1]))
        return ca.vertcat(-a1 * x[0] + b1 * r,
                          -a2 * x[1] + b2 * r + gg * u[0])

    def step(x, u, k):
        k1 = ode(x, u)
        k2 = ode(x + 0.5 * dt * k1, u)
        k3 = ode(x + 0.5 * dt * k2, u)
        k4 = ode(x + dt * k3, u)
        return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    def stage(x, u, k):
        e = x - ca.DM(CSTR_REF)
        return 10.0 * e[0] ** 2 + 10.0 * e[1] ** 2 + 0.1 * u[0] ** 2

    def ann_E_np(x):
        h = x
        for W, b in Ws[:-1]:
            h = np.tanh(h @ W + b)
        W, b = Ws[-1]
        return float(h @ W + b)

    def plant_ode(x, u):
        p = list(CSTR_P)
        p[5] = ann_E_np(x)
        return _cstr_ode_np(x, u, p)

    x = np.array([0.2, 0.1])
    X_meas, U_gold, U_ws = [x.copy()], [], None
    for _ in range(25):
        Xs, Us, _, ok = _ipopt_ms_solve(
            step, N, 2, 1, stage, lambda xN: 0,
            lbx=[-np.inf] * 2, ubx=[np.inf] * 2, lbu=[-5.0], ubu=[5.0],
            x0=x, U_init=U_ws)
        assert ok
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0].copy())
        x = _rk4(plant_ode, x, Us[0], 0.1)
        X_meas.append(x.copy())
    _save_nmpc("hybrid_ann", X_meas, U_gold)


GENERATORS = {"cstr_tracking": gen_cstr_tracking, "mhe_cstr": gen_mhe_cstr,
              "softcon_active": gen_softcon_active, "lmpc_di": gen_lmpc_di,
              "pathfollow_soft": gen_pathfollow_soft, "mintime": gen_mintime,
              "hybrid_ann": gen_hybrid_ann}


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
