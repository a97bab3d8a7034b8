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
# dae_colloc lifts the framework's collocation operator into the NLP: the
# framework solves the Radau residuals to machine precision (8 Newton
# iterations on a mildly nonlinear index-1 DAE), so imposing the SAME
# residuals (same C/D matrices, imported from hilo_mpc_tpu.core.integrators)
# as lifted equality constraints yields the identical discrete map at the
# optimum. smpc_chance reconstructs the deterministic surrogate symbolically:
# the GP posterior state (L, alpha, hyperparameters) is extracted numerically
# from the same seeded construction as tests/golden_configs.py — a numpy
# cross-check against gp.predict validates the extraction before any casadi
# work — and the mean map / linearized covariance propagation / erfinv
# back-off are rebuilt in casadi symbols (smpc.py:149-234 is the semantics
# being mirrored).
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


def gen_du_tracking():
    """Mirror golden_configs.build_du_tracking: CSTR tracking with Δu cost
    and Δu bounds. The framework's augmented-state Δu formulation
    (nmpc.py Δu handling) is algebraically the direct form written here:
    cost 0.5(u_k - u_{k-1})² with u_{-1} the previously applied input,
    |Δu| <= 0.5, carried across closed-loop steps."""
    import casadi as ca

    step = _cstr_rk4_ca()
    N, du_b = 15, 0.5

    x = np.array([0.2, 0.1])
    u_prev = 0.0
    X_meas, U_gold, U_ws = [x.copy()], [], None
    for _ in range(25):
        X = ca.SX.sym("X", 2, N + 1)
        U = ca.SX.sym("U", 1, N)
        g, lbg, ubg = [], [], []
        J = 0
        g.append(X[:, 0] - ca.DM(x)); lbg += [0.0] * 2; ubg += [0.0] * 2
        for k in range(N):
            e = X[:, k] - ca.DM(CSTR_REF)
            uk = U[0, k]
            ukm1 = u_prev if k == 0 else U[0, k - 1]
            J = J + 10.0 * e[0] ** 2 + 10.0 * e[1] ** 2 + 0.1 * uk ** 2 \
                + 0.5 * (uk - ukm1) ** 2
            g.append(uk - ukm1); lbg.append(-du_b); ubg.append(du_b)
            g.append(X[:, k + 1] - step(X[:, k], U[:, k], k))
            lbg += [0.0] * 2; ubg += [0.0] * 2
        w = ca.vertcat(ca.vec(X), ca.vec(U))
        lbw = np.concatenate([np.full(2 * (N + 1), -np.inf),
                              np.full(N, -5.0)])
        ubw = np.concatenate([np.full(2 * (N + 1), np.inf),
                              np.full(N, 5.0)])
        solver = ca.nlpsol("s", "ipopt", {"x": w, "f": J,
                                          "g": ca.vertcat(*g)}, IPOPT_OPTS)
        U0 = np.zeros((1, N)) if U_ws is None else np.asarray(U_ws).T
        w0 = np.concatenate([np.tile(x, N + 1), U0.ravel(order="F")])
        sol = solver(x0=w0, lbx=lbw, ubx=ubw, lbg=lbg, ubg=ubg)
        assert solver.stats()["success"]
        wv = np.asarray(sol["x"]).ravel()
        Us = wv[2 * (N + 1):].reshape(1, N, order="F").T
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0].copy())
        u_prev = float(Us[0, 0])
        x = _rk4(_cstr_ode_np, x, Us[0], 0.1)
        X_meas.append(x.copy())
    _save_nmpc("du_tracking", X_meas, U_gold)


def gen_dae_colloc():
    """Mirror golden_configs.build_dae_colloc: index-1 DAE NMPC, Radau IIA
    degree-3 collocation. The collocation matrices come from the SAME
    function the framework discretizes with
    (hilo_mpc_tpu.core.integrators.collocation_coefficients), and the stage
    states/algebraic variables are lifted into the NLP with the residuals as
    equalities — at the optimum this is the framework's discrete operator
    exactly (its 8 fixed Newton iterations converge to machine precision on
    this mildly nonlinear DAE)."""
    import casadi as ca

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from golden_configs import DAE_ALPHA, dae_ode_np
    from hilo_mpc_tpu.core.integrators import collocation_coefficients

    C, D, B, taus = collocation_coefficients(3, "radau")
    N, dt, d = 12, 0.1, 3

    def ode(xx, zz, uu):
        return -xx + zz + uu

    def alg(xx, zz):
        return zz - 0.5 * xx - DAE_ALPHA * zz ** 2

    x = np.array([0.1])
    X_meas, U_gold, U_ws = [x.copy()], [], None
    for _ in range(25):
        X = ca.SX.sym("X", 1, N + 1)
        U = ca.SX.sym("U", 1, N)
        Xc = ca.SX.sym("Xc", d, N)       # collocation states per interval
        Zc = ca.SX.sym("Zc", d, N)       # algebraic values at the nodes
        g, lbg, ubg = [], [], []
        J = 0
        g.append(X[0, 0] - float(x[0])); lbg.append(0.0); ubg.append(0.0)
        for k in range(N):
            J = J + 10.0 * (X[0, k] - 0.5) ** 2 + 0.1 * U[0, k] ** 2
            # collocation residuals: sum_r C[j-1,r] X_r = dt * f(X_j, Z_j, u)
            xall = [X[0, k]] + [Xc[j, k] for j in range(d)]
            for j in range(1, d + 1):
                xdot_poly = sum(float(C[j - 1, r]) * xall[r]
                                for r in range(d + 1))
                g.append(xdot_poly - dt * ode(Xc[j - 1, k], Zc[j - 1, k],
                                              U[0, k]))
                lbg.append(0.0); ubg.append(0.0)
                g.append(alg(Xc[j - 1, k], Zc[j - 1, k]))
                lbg.append(0.0); ubg.append(0.0)
            # continuity: x_{k+1} = sum_r D[r] X_r
            g.append(X[0, k + 1]
                     - sum(float(D[r]) * xall[r] for r in range(d + 1)))
            lbg.append(0.0); ubg.append(0.0)
        w = ca.vertcat(ca.vec(X), ca.vec(U), ca.vec(Xc), ca.vec(Zc))
        nw = (N + 1) + N + d * N + d * N
        lbw = np.full(nw, -np.inf); ubw = np.full(nw, np.inf)
        lbw[N + 1:N + 1 + N] = -2.0
        ubw[N + 1:N + 1 + N] = 2.0
        solver = ca.nlpsol("s", "ipopt", {"x": w, "f": J,
                                          "g": ca.vertcat(*g)}, IPOPT_OPTS)
        U0 = np.zeros(N) if U_ws is None else np.asarray(U_ws).ravel()
        w0 = np.concatenate([np.full(N + 1, float(x[0])), U0,
                             np.full(d * N, float(x[0])), np.zeros(d * N)])
        sol = solver(x0=w0, lbx=lbw, ubx=ubw, lbg=lbg, ubg=ubg)
        assert solver.stats()["success"]
        wv = np.asarray(sol["x"]).ravel()
        Us = wv[N + 1:N + 1 + N].reshape(N, 1)
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0].copy())
        x = rk4_like(dae_ode_np, x, Us[0])
        X_meas.append(x.copy())
    _save_nmpc("dae_colloc", X_meas, U_gold)


def rk4_like(f, x, u, dt=0.1):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def _extract_gp_state():
    """Rebuild the seeded GP from golden_configs.build_smpc_chance and pull
    its posterior numerics: training X, alpha, M = (K+sn2+floor)^-1, sf2,
    length scale. A numpy reimplementation is cross-checked against
    gp.predict on a grid BEFORE any casadi use, so an extraction mismatch
    fails loudly at generation time."""
    from hilo_mpc_tpu import GP

    rng = np.random.default_rng(3)
    X = np.linspace(-1.5, 1.5, 25)[:, None]
    y = 0.05 * np.sin(2 * X[:, 0]) + 0.02 * rng.standard_normal(25)
    gp = GP(["x1"], ["d"], noise_variance=0.02)
    gp.set_training_data(X, y)
    gp.setup()
    L, alpha = gp._state
    Minv = np.linalg.inv(L @ L.T)            # (K + (sn2+floor) I)^-1
    sf2 = float(np.squeeze(gp.kernel.signal_variance.value)) ** 2
    ell = float(np.squeeze(gp.kernel.length_scales.value))

    def k_np(a):
        return sf2 * np.exp(-0.5 * ((a - X[:, 0]) / ell) ** 2)

    # cross-check the extraction against the framework's own predict
    for a in np.linspace(-1.2, 1.2, 7):
        mu_ref, var_ref = gp.predict(np.array([[a]]))
        kv = k_np(a)
        mu_np = float(kv @ alpha)
        var_np = float(sf2 - kv @ Minv @ kv)
        assert abs(mu_np - float(np.squeeze(mu_ref))) < 1e-8, (a, mu_np, mu_ref)
        assert abs(var_np - float(np.squeeze(var_ref))) < 1e-8, (a, var_np, var_ref)
    return X[:, 0], alpha, Minv, sf2, ell


def gen_smpc_chance():
    """Mirror golden_configs.build_smpc_chance: SMPC over the deterministic
    mean+covariance surrogate (smpc.py:149-191) with the erfinv chance
    back-off (smpc.py:208-239). Surrogate state [mu (2); vec(P) (4)],
    discrete map mu+ = rk4(f)(mu,u) + Bw m_gp(mu_1); P+ = A P Aᵀ + Bw v_gp Bwᵀ
    with A = ∂mu+/∂mu (casadi jacobian = the surrogate's jax.jacfwd);
    chance row mu_1 + kappa sqrt(max(P_11,0)+1e-10) <= 0.9."""
    import casadi as ca
    from scipy.special import erfinv

    Xtr, alpha, Minv, sf2, ell = _extract_gp_state()
    kappa = float(np.sqrt(2.0) * erfinv(2.0 * 0.95 - 1.0))
    dt, N = 0.1, 10

    def f_nom(xx, uu):
        return ca.vertcat(xx[1], -0.5 * xx[0] - 0.4 * xx[1] + uu[0])

    def rk4_ca(xx, uu):
        k1 = f_nom(xx, uu)
        k2 = f_nom(xx + 0.5 * dt * k1, uu)
        k3 = f_nom(xx + 0.5 * dt * k2, uu)
        k4 = f_nom(xx + dt * k3, uu)
        return xx + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    def k_vec(a):
        return ca.vertcat(*[sf2 * ca.exp(-0.5 * ((a - xi) / ell) ** 2)
                            for xi in Xtr])

    def gp_mean(a):
        return ca.dot(k_vec(a), ca.DM(alpha))

    def gp_var(a):
        kv = k_vec(a)
        return sf2 - ca.bilin(ca.DM(Minv), kv, kv)

    # symbolic surrogate step on [mu; vec(P)] (row-major vec like jnp.reshape)
    mu_s = ca.SX.sym("mu", 2)
    u_s = ca.SX.sym("u", 1)
    P_s = ca.SX.sym("P", 2, 2)
    Bw = ca.DM([[0.0], [1.0]])               # gps={"x2": gp} -> unit selector
    mu_next = rk4_ca(mu_s, u_s) + Bw @ gp_mean(mu_s[0])
    A = ca.jacobian(mu_next, mu_s)
    P_next = A @ P_s @ A.T + Bw @ gp_var(mu_s[0]) @ Bw.T
    P_next = 0.5 * (P_next + P_next.T)
    F = ca.Function("F", [mu_s, ca.vec(P_s), u_s],
                    [mu_next, ca.vec(P_next)])

    x = np.array([0.3, 0.0])
    P0 = np.zeros((2, 2))
    X_meas, U_gold, U_ws = [x.copy()], [], None

    def plant_step_np(xx, uu):
        f = lambda a, b: np.array([a[1], -0.5 * a[0] - 0.4 * a[1] + b[0]])
        return rk4_like(f, xx, uu)

    for _ in range(25):
        MU = ca.SX.sym("MU", 2, N + 1)
        PV = ca.SX.sym("PV", 4, N + 1)
        U = ca.SX.sym("U", 1, N)
        g, lbg, ubg = [], [], []
        J = 0
        g.append(MU[:, 0] - ca.DM(x)); lbg += [0.0] * 2; ubg += [0.0] * 2
        g.append(PV[:, 0] - ca.DM(P0.ravel()))
        lbg += [0.0] * 4; ubg += [0.0] * 4
        for k in range(N):
            e = MU[:, k] - ca.DM([0.85, 0.0])
            J = J + 5.0 * e[0] ** 2 + 1.0 * e[1] ** 2 + 0.05 * U[0, k] ** 2
            mu_n, pv_n = F(MU[:, k], PV[:, k], U[:, k])
            g.append(MU[:, k + 1] - mu_n); lbg += [0.0] * 2; ubg += [0.0] * 2
            g.append(PV[:, k + 1] - pv_n); lbg += [0.0] * 4; ubg += [0.0] * 4
            # chance row at node k (stage constraint; P stored row-major so
            # P_11 is PV[3])
            sig = ca.sqrt(ca.fmax(PV[3, k], 0.0) + 1e-10)
            g.append(MU[0, k] + kappa * sig - 0.9)
            lbg.append(-np.inf); ubg.append(0.0)
        w = ca.vertcat(ca.vec(MU), ca.vec(PV), ca.vec(U))
        n_mu, n_pv = 2 * (N + 1), 4 * (N + 1)
        lbw = np.concatenate([np.full(n_mu + n_pv, -np.inf),
                              np.full(N, -2.0)])
        ubw = np.concatenate([np.full(n_mu + n_pv, np.inf),
                              np.full(N, 2.0)])
        solver = ca.nlpsol("s", "ipopt", {"x": w, "f": J,
                                          "g": ca.vertcat(*g)}, IPOPT_OPTS)
        U0 = np.zeros(N) if U_ws is None else np.asarray(U_ws).ravel()
        w0 = np.concatenate([np.tile(x, N + 1), np.tile(P0.ravel(), N + 1),
                             U0])
        sol = solver(x0=w0, lbx=lbw, ubx=ubw, lbg=lbg, ubg=ubg)
        assert solver.stats()["success"]
        wv = np.asarray(sol["x"]).ravel()
        Us = wv[n_mu + n_pv:].reshape(N, 1)
        U_ws = np.vstack([Us[1:], Us[-1:]])
        U_gold.append(Us[0].copy())
        x = plant_step_np(x, Us[0])
        X_meas.append(x.copy())
    _save_nmpc("smpc_chance", X_meas, U_gold)


GENERATORS = {"cstr_tracking": gen_cstr_tracking, "mhe_cstr": gen_mhe_cstr,
              "softcon_active": gen_softcon_active, "lmpc_di": gen_lmpc_di,
              "pathfollow_soft": gen_pathfollow_soft, "mintime": gen_mintime,
              "hybrid_ann": gen_hybrid_ann, "du_tracking": gen_du_tracking,
              "dae_colloc": gen_dae_colloc, "smpc_chance": gen_smpc_chance}


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
