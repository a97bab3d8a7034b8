"""Independent high-accuracy OCP oracle for golden-fixture generation.

Solves the SAME optimal-control problem the framework's interior-point engine
solves (identical dynamics/cost/constraint functions and bounds) but with a
completely different method: single-shooting reduction (decision variables are
the input sequence only — the reference's multiple-shooting decision vector is
eliminated by rollout) optimized by SciPy (L-BFGS-B for box-only problems,
trust-constr otherwise) with exact JAX derivatives at float64 and tolerances
~1e-11. Nothing from ops/ip_solver.py is imported: agreement therefore certifies
the interior-point kernel against an independent optimizer, the same role
CasADi/IPOPT plays for the reference (reference solve path:
hilo_mpc/modules/controller/mpc.py:1778-1787). CasADi cannot be installed in
this environment; tools/make_golden_ipopt.py regenerates the identical fixture
schema with real IPOPT wherever casadi is available.
"""
from __future__ import annotations

import numpy as np


def oracle_solve(funcs, dims, bounds, theta, xs0, fix_x0=True, U0=None,
                 maxiter=4000, gtol=1e-11):
    """Solve one OCP instance to high accuracy, independently of the IP engine.

    Returns dict with X (N+1, nx), U (N, nu), objective, success, and the
    optimizer's reported optimality measure.

    Equality-constrained problems (terminal/stage equalities — e.g. the
    minimum-time rest-to-rest configs) are dispatched to the
    multiple-shooting reduction (`oracle_solve_ms`): single shooting composes
    N dynamics maps into one dense chain, which conditions bang-bang
    equality-constrained problems so badly that trust-constr stalls far from
    optimality; with (X, U) as decision variables and defect equalities the
    same solver converges tightly. Both reductions share nothing with
    ops/ip_solver.py.
    """
    if dims.n_e or dims.n_eN:
        return oracle_solve_ms(funcs, dims, bounds, theta, xs0,
                               fix_x0=fix_x0, U0=U0, maxiter=maxiter,
                               gtol=gtol)
    import jax
    import jax.numpy as jnp
    from scipy.optimize import Bounds, NonlinearConstraint, minimize

    assert jax.config.jax_enable_x64, "oracle requires x64"
    N, nx, nu = dims.N, dims.nx, dims.nu
    theta = np.asarray(theta, dtype=np.float64)
    xs0 = np.asarray(xs0, dtype=np.float64).ravel()
    lbx = np.asarray(bounds.lbx, dtype=np.float64)
    ubx = np.asarray(bounds.ubx, dtype=np.float64)
    lbu = np.asarray(bounds.lbu, dtype=np.float64)
    ubu = np.asarray(bounds.ubu, dtype=np.float64)

    n_u_flat = N * nu
    if U0 is not None:
        # the IP engine broadcasts a narrower warm start across control
        # columns (ip_solver.py:375, jnp.where semantics); mirror that so the
        # oracle starts from the identical point
        U0 = np.broadcast_to(np.asarray(U0, np.float64), (N, nu))

    def split(z):
        if fix_x0:
            x0 = jnp.asarray(xs0)
            U = z.reshape(N, nu)
        else:
            x0 = z[:nx]
            U = z[nx:].reshape(N, nu)
        return x0, U

    def rollout(z):
        x0, U = split(z)
        xs = [x0]
        for k in range(N):
            xs.append(funcs.dyn(xs[-1], U[k], jnp.asarray(theta[k])))
        return jnp.stack(xs), U

    def objective(z):
        X, U = rollout(z)
        J = 0.0
        for k in range(N):
            J = J + funcs.stage_cost(X[k], U[k], jnp.asarray(theta[k]))
        return J + funcs.term_cost(X[N], jnp.asarray(theta[N]))

    obj_jit = jax.jit(objective)
    grad_jit = jax.jit(jax.grad(objective))
    f = lambda z: float(obj_jit(jnp.asarray(z)))
    g = lambda z: np.asarray(grad_jit(jnp.asarray(z)), dtype=np.float64)

    # box bounds on the decision vector
    lb_u = lbu.reshape(n_u_flat)
    ub_u = ubu.reshape(n_u_flat)
    if fix_x0:
        lb_z, ub_z = lb_u, ub_u
        z0 = (np.zeros(n_u_flat) if U0 is None
              else np.asarray(U0, dtype=np.float64).reshape(n_u_flat))
    else:
        lb_z = np.concatenate([lbx[0], lb_u])
        ub_z = np.concatenate([ubx[0], ub_u])
        z0 = np.concatenate([xs0, np.zeros(n_u_flat) if U0 is None
                             else np.asarray(U0, np.float64).reshape(n_u_flat)])
    z0 = np.clip(z0, lb_z, ub_z)

    constraints = []
    # finite state bounds on rolled-out states x_1..x_N (x_0 handled above)
    mask = np.isfinite(lbx[1:]) | np.isfinite(ubx[1:])
    if mask.any():
        rows, cols = np.nonzero(mask)

        def state_con(z):
            X, _ = rollout(jnp.asarray(z))
            return X[1:][jnp.asarray(rows), jnp.asarray(cols)]

        sc_jit = jax.jit(state_con)
        sc_jac = jax.jit(jax.jacrev(state_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(sc_jit(z), np.float64),
            lb=lbx[1:][mask], ub=ubx[1:][mask],
            jac=lambda z: np.asarray(sc_jac(z), np.float64)))
    # custom stage/terminal inequalities h <= 0 and equalities e == 0
    if funcs.stage_ineq is not None and dims.n_h:
        def h_con(z):
            X, U = rollout(jnp.asarray(z))
            return jnp.concatenate(
                [funcs.stage_ineq(X[k], U[k], jnp.asarray(theta[k]))
                 for k in range(N)])

        hj = jax.jit(h_con)
        hjac = jax.jit(jax.jacrev(h_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(hj(z), np.float64), -np.inf, 0.0,
            jac=lambda z: np.asarray(hjac(z), np.float64)))
    if funcs.term_ineq is not None and dims.n_hN:
        def hN_con(z):
            X, _ = rollout(jnp.asarray(z))
            return funcs.term_ineq(X[N], jnp.asarray(theta[N]))

        hNj = jax.jit(hN_con)
        hNjac = jax.jit(jax.jacrev(hN_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(hNj(z), np.float64), -np.inf, 0.0,
            jac=lambda z: np.asarray(hNjac(z), np.float64)))
    if funcs.stage_eq is not None and dims.n_e:
        def e_con(z):
            X, U = rollout(jnp.asarray(z))
            return jnp.concatenate(
                [funcs.stage_eq(X[k], U[k], jnp.asarray(theta[k]))
                 for k in range(N)])

        ej = jax.jit(e_con)
        ejac = jax.jit(jax.jacrev(e_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(ej(z), np.float64), 0.0, 0.0,
            jac=lambda z: np.asarray(ejac(z), np.float64)))
    if funcs.term_eq is not None and dims.n_eN:
        def eN_con(z):
            X, _ = rollout(jnp.asarray(z))
            return funcs.term_eq(X[N], jnp.asarray(theta[N]))

        eNj = jax.jit(eN_con)
        eNjac = jax.jit(jax.jacrev(eN_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(eNj(z), np.float64), 0.0, 0.0,
            jac=lambda z: np.asarray(eNjac(z), np.float64)))

    def _opt_measure(r):
        # projected-gradient norm at the solution (box-aware optimality)
        zz = np.clip(r.x, lb_z, ub_z)
        gr = g(zz)
        step = np.clip(zz - gr, lb_z, ub_z) - zz
        return float(np.abs(step).max())

    # stiff cost weights (MHE: 1e3-1e4) can abort a single L-BFGS-B line
    # search far from the optimum; run a restart ladder from NEUTRAL points
    # (never from the IP engine's answer — that would bias the oracle) and
    # keep the best verified objective
    starts = [z0, np.clip(np.zeros_like(z0), lb_z, ub_z)]
    if not fix_x0:
        zx = np.clip(np.zeros_like(z0), lb_z, ub_z)
        zx[:nx] = np.clip(xs0, lb_z[:nx], ub_z[:nx])
        starts.append(zx)
    best = None
    for zs in starts:
        if not constraints:
            r = minimize(f, zs, jac=g, method="L-BFGS-B",
                         bounds=list(zip(lb_z, ub_z)),
                         options={"maxiter": maxiter, "ftol": 1e-16,
                                  "gtol": gtol, "maxcor": 50})
            # polish / rescue with trust-region Newton-CG-style solver when
            # the line search aborted early
            if _opt_measure(r) > 1e-8:
                r2 = minimize(f, r.x, jac=g, method="trust-constr",
                              bounds=Bounds(lb_z, ub_z),
                              options={"maxiter": maxiter, "gtol": gtol,
                                       "xtol": 1e-14})
                if r2.fun <= r.fun:
                    r = r2
        else:
            r = minimize(f, zs, jac=g, method="trust-constr",
                         bounds=Bounds(lb_z, ub_z), constraints=constraints,
                         options={"maxiter": maxiter, "gtol": gtol,
                                  "xtol": 1e-14})
        if best is None or r.fun < best.fun:
            best = r
        if not constraints and _opt_measure(best) < 1e-9:
            break
        if (constraints and best.success
                and getattr(best, "optimality", np.inf) < max(gtol * 100,
                                                              1e-9)
                and getattr(best, "constr_violation", np.inf) < 1e-9):
            # a verified-optimal constrained solve: further restarts only
            # re-derive the same point at trust-constr cost
            break
    res = best
    X, U = rollout(jnp.asarray(res.x))
    opt = getattr(res, "optimality", None)
    if opt is None:
        opt = _opt_measure(res)
    return {
        "X": np.asarray(X, np.float64), "U": np.asarray(U, np.float64),
        "objective": float(res.fun), "success": bool(res.success),
        "optimality": float(opt),
    }


def oracle_solve_ms(funcs, dims, bounds, theta, xs0, fix_x0=True, U0=None,
                    maxiter=4000, gtol=1e-11):
    """Multiple-shooting oracle: decision variables are (X_1..X_N, U_0..U_{N-1})
    with the dynamics as defect equality constraints — the same reduction the
    reference hands to IPOPT (multiple shooting), solved by SciPy
    trust-constr with exact JAX derivatives at float64. State bounds become
    plain box bounds on the decision vector (no nonlinear constraint needed).
    """
    import jax
    import jax.numpy as jnp
    from scipy.optimize import Bounds, NonlinearConstraint, minimize

    assert jax.config.jax_enable_x64, "oracle requires x64"
    N, nx, nu = dims.N, dims.nx, dims.nu
    theta = np.asarray(theta, dtype=np.float64)
    xs0 = np.asarray(xs0, dtype=np.float64).ravel()
    lbx = np.asarray(bounds.lbx, dtype=np.float64)
    ubx = np.asarray(bounds.ubx, dtype=np.float64)
    lbu = np.asarray(bounds.lbu, dtype=np.float64)
    ubu = np.asarray(bounds.ubu, dtype=np.float64)
    assert fix_x0, "oracle_solve_ms currently covers the fix_x0 OCP form"

    n_x_flat = N * nx              # X_1..X_N
    n_u_flat = N * nu

    def split(z):
        X = jnp.concatenate([jnp.asarray(xs0)[None, :],
                             z[:n_x_flat].reshape(N, nx)])
        U = z[n_x_flat:].reshape(N, nu)
        return X, U

    def objective(z):
        X, U = split(z)
        J = 0.0
        for k in range(N):
            J = J + funcs.stage_cost(X[k], U[k], jnp.asarray(theta[k]))
        return J + funcs.term_cost(X[N], jnp.asarray(theta[N]))

    obj_jit = jax.jit(objective)
    grad_jit = jax.jit(jax.grad(objective))
    f = lambda z: float(obj_jit(jnp.asarray(z)))
    g = lambda z: np.asarray(grad_jit(jnp.asarray(z)), dtype=np.float64)

    lb_z = np.concatenate([lbx[1:].reshape(n_x_flat), lbu.reshape(n_u_flat)])
    ub_z = np.concatenate([ubx[1:].reshape(n_x_flat), ubu.reshape(n_u_flat)])

    def defects(z):
        X, U = split(z)
        return jnp.concatenate(
            [funcs.dyn(X[k], U[k], jnp.asarray(theta[k])) - X[k + 1]
             for k in range(N)])

    dj = jax.jit(defects)
    djac = jax.jit(jax.jacrev(defects))
    constraints = [NonlinearConstraint(
        lambda z: np.asarray(dj(z), np.float64), 0.0, 0.0,
        jac=lambda z: np.asarray(djac(z), np.float64))]
    if funcs.stage_ineq is not None and dims.n_h:
        def h_con(z):
            X, U = split(z)
            return jnp.concatenate(
                [funcs.stage_ineq(X[k], U[k], jnp.asarray(theta[k]))
                 for k in range(N)])

        hj, hjac = jax.jit(h_con), jax.jit(jax.jacrev(h_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(hj(z), np.float64), -np.inf, 0.0,
            jac=lambda z: np.asarray(hjac(z), np.float64)))
    if funcs.term_ineq is not None and dims.n_hN:
        def hN_con(z):
            X, _ = split(z)
            return funcs.term_ineq(X[N], jnp.asarray(theta[N]))

        hNj, hNjac = jax.jit(hN_con), jax.jit(jax.jacrev(hN_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(hNj(z), np.float64), -np.inf, 0.0,
            jac=lambda z: np.asarray(hNjac(z), np.float64)))
    if funcs.stage_eq is not None and dims.n_e:
        def e_con(z):
            X, U = split(z)
            return jnp.concatenate(
                [funcs.stage_eq(X[k], U[k], jnp.asarray(theta[k]))
                 for k in range(N)])

        ej, ejac = jax.jit(e_con), jax.jit(jax.jacrev(e_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(ej(z), np.float64), 0.0, 0.0,
            jac=lambda z: np.asarray(ejac(z), np.float64)))
    if funcs.term_eq is not None and dims.n_eN:
        def eN_con(z):
            X, _ = split(z)
            return funcs.term_eq(X[N], jnp.asarray(theta[N]))

        eNj, eNjac = jax.jit(eN_con), jax.jit(jax.jacrev(eN_con))
        constraints.append(NonlinearConstraint(
            lambda z: np.asarray(eNj(z), np.float64), 0.0, 0.0,
            jac=lambda z: np.asarray(eNjac(z), np.float64)))

    # initial point: roll the warm-start controls out through the dynamics
    U0_arr = (np.zeros((N, nu)) if U0 is None
              else np.broadcast_to(np.asarray(U0, np.float64), (N, nu)))
    U0_arr = np.clip(U0_arr, lbu, ubu)
    X_roll = [xs0]
    roll = jax.jit(lambda x, u, th: funcs.dyn(x, u, th))
    for k in range(N):
        X_roll.append(np.asarray(roll(jnp.asarray(X_roll[-1]),
                                      jnp.asarray(U0_arr[k]),
                                      jnp.asarray(theta[k]))))
    z0 = np.concatenate([np.stack(X_roll[1:]).reshape(n_x_flat),
                         U0_arr.reshape(n_u_flat)])
    z0 = np.clip(np.nan_to_num(z0), lb_z, ub_z)

    r = minimize(f, z0, jac=g, method="trust-constr",
                 bounds=Bounds(lb_z, ub_z), constraints=constraints,
                 options={"maxiter": maxiter, "gtol": gtol, "xtol": 1e-14})
    X, U = split(jnp.asarray(r.x))
    return {
        "X": np.asarray(X, np.float64), "U": np.asarray(U, np.float64),
        "objective": float(r.fun), "success": bool(r.success),
        "optimality": float(getattr(r, "optimality", np.nan)),
    }


class SolveCapture:
    """Wrap a controller/estimator's jitted solve entry points to capture the
    exact (theta, xs0, U_init) of every solve it performs. The captured problem
    data is fed to `oracle_solve`, guaranteeing the oracle and the IP engine
    answer the *identical* NLP instance."""

    def __init__(self, obj):
        self.calls = []
        self._obj = obj
        self._names = [n for n in ("_solve_jit", "_solve_warm_jit")
                       if getattr(obj, n, None) is not None]
        self._orig = {n: getattr(obj, n) for n in self._names}

    def __enter__(self):
        for n in self._names:
            orig = self._orig[n]

            def wrapped(bounds, theta, xs0, X_init, U_init, _orig=orig):
                self.calls.append((np.asarray(theta, np.float64),
                                   np.asarray(xs0, np.float64),
                                   np.asarray(U_init, np.float64)))
                return _orig(bounds, theta, xs0, X_init, U_init)

            setattr(self._obj, n, wrapped)
        return self

    def __exit__(self, *exc):
        for n in self._names:
            setattr(self._obj, n, self._orig[n])
        return False
