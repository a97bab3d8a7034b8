"""Interior-point OCP solver tests: parity vs scipy (tier (d), SURVEY.md §4) and
Riccati/LQR numerics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from hilo_mpc_tpu.ops.ip_solver import (IPOptions, OCPBounds, OCPDims,
                                        OCPFunctions, solve_ocp)
from hilo_mpc_tpu.ops.riccati import dare_solve, lqr_backward, solve_lq

NX, NU, N = 2, 1, 10
DT = 0.2
A = np.array([[1.0, DT], [0.0, 1.0]])
B = np.array([[0.5 * DT ** 2], [DT]])
Q = np.diag([1.0, 0.1])
R = np.array([[0.05]])
X0 = np.array([1.5, 0.0])


def _funcs():
    dyn = lambda x, u, th: jnp.asarray(A) @ x + jnp.asarray(B) @ u
    sc = lambda x, u, th: x @ jnp.asarray(Q) @ x + u @ jnp.asarray(R) @ u
    tc = lambda x, th: 5.0 * (x @ jnp.asarray(Q) @ x)
    return OCPFunctions(dyn=dyn, stage_cost=sc, term_cost=tc)


def _solve(bounds, opts=None, x0=X0):
    dims = OCPDims(nx=NX, nu=NU, N=N)
    theta = jnp.zeros((N + 1, 2))
    Xi = jnp.tile(jnp.asarray(x0)[None], (N + 1, 1))
    Ui = jnp.zeros((N, NU))
    return solve_ocp(_funcs(), dims, bounds, theta, jnp.asarray(x0), Xi, Ui,
                     opts or IPOptions(max_iter=60, tol=1e-8))


def _scipy_obj(Uflat, x0=X0):
    U = Uflat.reshape(N, NU)
    x = np.array(x0)
    J = 0.0
    for k in range(N):
        J += x @ Q @ x + U[k] @ R @ U[k]
        x = A @ x + B @ U[k]
    return J + 5.0 * x @ Q @ x


def _sim(Uflat, x0=X0):
    U = Uflat.reshape(N, NU)
    xs = [np.array(x0)]
    for k in range(N):
        xs.append(A @ xs[-1] + B @ U[k])
    return np.array(xs)


class TestIPSolver:
    def test_box_constrained_matches_scipy(self):
        inf = np.inf
        bounds = OCPBounds(
            lbx=jnp.full((N + 1, NX), -inf), ubx=jnp.full((N + 1, NX), inf),
            lbu=jnp.full((N, NU), -0.6), ubu=jnp.full((N, NU), 0.6))
        sol = _solve(bounds)
        assert bool(sol.converged)
        assert float(sol.kkt_error) < 1e-8
        res = minimize(_scipy_obj, np.zeros(N), method="SLSQP",
                       bounds=[(-0.6, 0.6)] * N,
                       options={"ftol": 1e-12, "maxiter": 500})
        np.testing.assert_allclose(np.asarray(sol.U).ravel(), res.x, atol=1e-5)
        assert abs(float(sol.objective) - res.fun) < 1e-6

    def test_state_constrained_matches_scipy(self):
        inf = np.inf
        bounds = OCPBounds(
            lbx=jnp.concatenate([jnp.full((N + 1, 1), -inf),
                                 jnp.full((N + 1, 1), -0.35)], axis=1),
            ubx=jnp.full((N + 1, NX), inf),
            lbu=jnp.full((N, NU), -0.6), ubu=jnp.full((N, NU), 0.6))
        sol = _solve(bounds, IPOptions(max_iter=80, tol=1e-8))
        assert bool(sol.converged)
        assert np.asarray(sol.X)[:, 1].min() > -0.35 - 1e-7
        cons = [{"type": "ineq", "fun": lambda Uf: _sim(Uf)[:, 1] + 0.35}]
        res = minimize(_scipy_obj, np.zeros(N), method="SLSQP",
                       bounds=[(-0.6, 0.6)] * N, constraints=cons,
                       options={"ftol": 1e-12, "maxiter": 500})
        np.testing.assert_allclose(np.asarray(sol.U).ravel(), res.x, atol=1e-5)

    def test_unconstrained_matches_riccati(self):
        inf = np.inf
        bounds = OCPBounds(
            lbx=jnp.full((N + 1, NX), -inf), ubx=jnp.full((N + 1, NX), inf),
            lbu=jnp.full((N, NU), -inf), ubu=jnp.full((N, NU), inf))
        sol = _solve(bounds)
        assert bool(sol.converged)
        # closed-form LQ solution via a single Riccati sweep (our own sweep, but fed
        # exact matrices — the IP path must agree after convergence)
        lq = solve_lq(
            jnp.tile(jnp.asarray(A)[None], (N, 1, 1)),
            jnp.tile(jnp.asarray(B)[None], (N, 1, 1)),
            jnp.tile(2 * jnp.asarray(Q)[None], (N, 1, 1)),
            jnp.zeros((N, NU, NX)),
            jnp.tile(2 * jnp.asarray(R)[None], (N, 1, 1)),
            jnp.zeros((N, NX)), jnp.zeros((N, NU)), jnp.zeros((N, NX)),
            10.0 * jnp.asarray(Q), jnp.zeros(NX), jnp.asarray(X0))
        np.testing.assert_allclose(np.asarray(sol.U), np.asarray(lq.dU), atol=1e-6)

    def test_batched_vmap_solves(self):
        inf = np.inf
        bounds = OCPBounds(
            lbx=jnp.full((N + 1, NX), -inf), ubx=jnp.full((N + 1, NX), inf),
            lbu=jnp.full((N, NU), -0.6), ubu=jnp.full((N, NU), 0.6))
        dims = OCPDims(nx=NX, nu=NU, N=N)
        Bn = 8
        x0s = jnp.asarray(np.random.default_rng(0).normal(size=(Bn, NX)))
        theta = jnp.zeros((Bn, N + 1, 2))
        Xi = jnp.tile(x0s[:, None, :], (1, N + 1, 1))
        Ui = jnp.zeros((Bn, N, NU))
        funcs = _funcs()
        opts = IPOptions(max_iter=60, tol=1e-8)

        batch = jax.vmap(lambda th, x0, X, U: solve_ocp(
            funcs, dims, bounds, th, x0, X, U, opts))
        sol = batch(theta, x0s, Xi, Ui)
        assert bool(jnp.all(sol.converged))
        # spot-check one lane against a solo solve
        solo = _solve(bounds, opts, x0=np.asarray(x0s[3]))
        np.testing.assert_allclose(np.asarray(sol.U)[3], np.asarray(solo.U),
                                   atol=1e-6)

    def test_infeasible_start_recovers(self):
        # x0 outside state bounds at later stages forces active work
        bounds = OCPBounds(
            lbx=jnp.full((N + 1, NX), -10.0), ubx=jnp.full((N + 1, NX), 10.0),
            lbu=jnp.full((N, NU), -0.6), ubu=jnp.full((N, NU), 0.6))
        sol = _solve(bounds)
        assert bool(sol.converged)


class TestRiccati:
    def test_lqr_gain_stabilizes(self):
        dtype = jnp.float64
        K, P0 = lqr_backward(jnp.asarray(A, dtype), jnp.asarray(B, dtype),
                             jnp.asarray(Q, dtype), jnp.asarray(R, dtype),
                             horizon=50)
        Acl = A + B @ np.asarray(K[0])   # sweep convention: u = +K x
        assert np.max(np.abs(np.linalg.eigvals(Acl))) < 1.0

    def test_dare_fixed_point(self):
        dtype = jnp.float64
        K, P = dare_solve(jnp.asarray(A, dtype), jnp.asarray(B, dtype),
                          jnp.asarray(Q, dtype), jnp.asarray(R, dtype))
        P = np.asarray(P)
        K = np.asarray(K)
        # verify the DARE residual
        res = (A.T @ P @ A - P
               - A.T @ P @ B @ np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A) + Q)
        assert np.max(np.abs(res)) < 1e-8
        Acl = A - B @ K
        assert np.max(np.abs(np.linalg.eigvals(Acl))) < 1.0


class TestParallelRiccati:
    def _random_lq(self, N, nx=3, nu=2, seed=0):
        rng = np.random.default_rng(seed)
        A_ = jnp.asarray(rng.normal(0, 0.3, (N, nx, nx)) + np.eye(nx) * 0.9)
        B_ = jnp.asarray(rng.normal(0, 0.3, (N, nx, nu)))
        Qh = rng.normal(0, 1, (N, nx, nx))
        Q_ = jnp.asarray(Qh @ Qh.transpose(0, 2, 1) * 0.1 + np.eye(nx))
        Rh = rng.normal(0, 1, (N, nu, nu))
        R_ = jnp.asarray(Rh @ Rh.transpose(0, 2, 1) * 0.1 + np.eye(nu) * 0.5)
        S_ = jnp.asarray(rng.normal(0, 0.05, (N, nu, nx)))
        q_ = jnp.asarray(rng.normal(0, 1, (N, nx)))
        r_ = jnp.asarray(rng.normal(0, 1, (N, nu)))
        c_ = jnp.asarray(rng.normal(0, 0.2, (N, nx)))
        Pt = jnp.asarray(np.eye(nx) * 3.0)
        pt = jnp.asarray(rng.normal(0, 1, nx))
        dx0 = jnp.asarray(rng.normal(0, 1, nx))
        return (A_, B_, Q_, S_, R_, q_, r_, c_, Pt, pt, dx0)

    @pytest.mark.parametrize("N", [1, 2, 7, 64])
    def test_matches_sequential(self, N):
        from hilo_mpc_tpu.ops.riccati import solve_lq_parallel

        args = self._random_lq(N)
        s1 = solve_lq(*args, reg=1e-9)
        s2 = solve_lq_parallel(*args, reg=1e-9)
        np.testing.assert_allclose(np.asarray(s1.dU), np.asarray(s2.dU),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(s1.dX), np.asarray(s2.dX),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(s1.lam), np.asarray(s2.lam),
                                   atol=1e-10)

    def test_parallel_scan_f32_accuracy_long_horizon(self):
        # regression pin for the documented precision claim: at N=256 in f32
        # (with the solver's "highest" matmul precision) the associative-scan
        # compositions stay within ~1e-5 of the f64 sequential truth
        from hilo_mpc_tpu.ops.riccati import solve_lq_parallel

        args = self._random_lq(256, seed=7)
        truth = np.asarray(solve_lq(*args, reg=1e-9).dU)
        args32 = tuple(jnp.asarray(a, jnp.float32) for a in args)
        with jax.default_matmul_precision("highest"):
            dU32 = np.asarray(solve_lq_parallel(*args32, reg=1e-7).dU)
        scale = max(np.max(np.abs(truth)), 1.0)
        assert np.max(np.abs(dU32 - truth)) / scale < 1e-5

    def test_ip_solver_with_parallel_riccati(self):
        inf = np.inf
        bounds = OCPBounds(
            lbx=jnp.full((N + 1, NX), -inf), ubx=jnp.full((N + 1, NX), inf),
            lbu=jnp.full((N, NU), -0.6), ubu=jnp.full((N, NU), 0.6))
        sol_seq = _solve(bounds, IPOptions(max_iter=60, tol=1e-8))
        sol_par = _solve(bounds, IPOptions(max_iter=60, tol=1e-8,
                                           parallel_riccati=True))
        assert bool(sol_par.converged)
        np.testing.assert_allclose(np.asarray(sol_par.U), np.asarray(sol_seq.U),
                                   atol=1e-7)


class TestRobustness:
    def test_nan_dynamics_reports_diverged(self):
        # dynamics that blow up to NaN must freeze the lane and report status 2,
        # not poison the batch (SURVEY §5: per-scenario failure masks)
        def bad_dyn(x, u, th):
            return x * jnp.exp(x * 50.0) + u  # overflows for x ~ 1.5

        funcs = OCPFunctions(
            dyn=bad_dyn,
            stage_cost=lambda x, u, th: jnp.sum(x ** 2) + jnp.sum(u ** 2),
            term_cost=lambda x, th: jnp.sum(x ** 2))
        dims = OCPDims(nx=1, nu=1, N=5)
        inf = np.inf
        bounds = OCPBounds(lbx=jnp.full((6, 1), -inf), ubx=jnp.full((6, 1), inf),
                           lbu=jnp.full((5, 1), -inf), ubu=jnp.full((5, 1), inf))
        sol = solve_ocp(funcs, dims, bounds, jnp.zeros((6, 1)),
                        jnp.array([1.5]), jnp.full((6, 1), 1.5),
                        jnp.zeros((5, 1)), IPOptions(max_iter=20))
        assert int(sol.status) in (1, 2)
        assert np.all(np.isfinite(np.asarray(sol.U)))

    def test_one_bad_lane_does_not_poison_batch(self):
        funcs = _funcs()
        dims = OCPDims(nx=NX, nu=NU, N=N)
        inf = np.inf
        bounds = OCPBounds(
            lbx=jnp.full((N + 1, NX), -inf), ubx=jnp.full((N + 1, NX), inf),
            lbu=jnp.full((N, NU), -0.6), ubu=jnp.full((N, NU), 0.6))
        x0s = jnp.asarray(np.vstack([np.tile(X0, (3, 1)),
                                     [[1e12, -1e12]]]))  # lane 3 absurd
        theta = jnp.zeros((4, N + 1, 2))
        Xi = jnp.tile(x0s[:, None, :], (1, N + 1, 1))
        Ui = jnp.zeros((4, N, NU))
        sol = jax.vmap(lambda th, x0, X, U: solve_ocp(
            funcs, dims, bounds, th, x0, X, U, IPOptions(max_iter=40)))(
            theta, x0s, Xi, Ui)
        conv = np.asarray(sol.converged)
        assert conv[:3].all()          # healthy lanes converge regardless
        assert np.all(np.isfinite(np.asarray(sol.U[:3])))


class TestPerScenarioBounds:
    def test_bound_axes_vary_per_scenario(self):
        from hilo_mpc_tpu.ops.ip_solver import solve_ocp_batched

        funcs = _funcs()
        dims = OCPDims(nx=NX, nu=NU, N=N)
        Bn = 4
        inf = np.inf
        # each scenario gets its own control limit
        u_lims = np.array([0.2, 0.4, 0.6, 5.0])
        bounds = OCPBounds(
            lbx=jnp.full((Bn, N + 1, NX), -inf),
            ubx=jnp.full((Bn, N + 1, NX), inf),
            lbu=-u_lims[:, None, None] * jnp.ones((Bn, N, NU)),
            ubu=u_lims[:, None, None] * jnp.ones((Bn, N, NU)))
        x0s = jnp.tile(jnp.asarray(X0)[None], (Bn, 1))
        theta = jnp.zeros((Bn, N + 1, 2))
        Xi = jnp.tile(x0s[:, None, :], (1, N + 1, 1))
        Ui = jnp.zeros((Bn, N, NU))
        sol = solve_ocp_batched(
            funcs, dims, bounds, theta, x0s, Xi, Ui,
            IPOptions(max_iter=60, tol=1e-8),
            bound_axes=OCPBounds(lbx=0, ubx=0, lbu=0, ubu=0))
        assert bool(np.asarray(sol.converged).all())
        U = np.asarray(sol.U)
        for i, lim in enumerate(u_lims):
            assert np.max(np.abs(U[i])) <= lim + 1e-7
        # tighter limits -> first move saturates at its own bound
        assert abs(U[0, 0, 0]) == pytest.approx(0.2, abs=1e-6)
        assert abs(U[1, 0, 0]) == pytest.approx(0.4, abs=1e-6)


class TestSmallSolveAndUnroll:
    def test_solve_psd_small_matches_numpy(self):
        from hilo_mpc_tpu.ops.riccati import solve_psd_small
        rng = np.random.default_rng(3)
        for n in (1, 2, 3, 4):
            M = rng.standard_normal((5, n, n))
            G = M @ np.swapaxes(M, 1, 2) + n * np.eye(n)
            rhs = rng.standard_normal((5, n, n + 2))
            got = np.asarray(solve_psd_small(jnp.asarray(G), jnp.asarray(rhs)))
            want = np.linalg.solve(G, rhs)
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_riccati_unroll_matches_sequential(self):
        rng = np.random.default_rng(7)
        nx, nu, n = 3, 2, 12
        As = jnp.asarray(np.eye(nx) + 0.05 * rng.standard_normal((n, nx, nx)))
        Bs = jnp.asarray(0.3 * rng.standard_normal((n, nx, nu)))
        Qs = jnp.tile(jnp.eye(nx), (n, 1, 1))
        Ss = jnp.zeros((n, nu, nx))
        Rs = jnp.tile(0.1 * jnp.eye(nu), (n, 1, 1))
        q = jnp.asarray(rng.standard_normal((n, nx)))
        r = jnp.asarray(rng.standard_normal((n, nu)))
        c = jnp.asarray(0.1 * rng.standard_normal((n, nx)))
        Pt = jnp.eye(nx)
        pt = jnp.zeros(nx)
        dx0 = jnp.asarray(rng.standard_normal(nx))
        s1 = solve_lq(As, Bs, Qs, Ss, Rs, q, r, c, Pt, pt, dx0)
        s2 = solve_lq(As, Bs, Qs, Ss, Rs, q, r, c, Pt, pt, dx0, unroll=n)
        np.testing.assert_allclose(np.asarray(s1.dU), np.asarray(s2.dU),
                                   rtol=1e-5, atol=1e-6)

    def test_solve_ocp_unroll_matches(self):
        bounds_args = dict(
            lbx=jnp.full((N + 1, NX), -np.inf), ubx=jnp.full((N + 1, NX), np.inf),
            lbu=jnp.full((N, NU), -0.8), ubu=jnp.full((N, NU), 0.8))
        b = OCPBounds(**bounds_args)
        funcs = _funcs()
        dims = OCPDims(nx=NX, nu=NU, N=N)
        theta = jnp.zeros((N + 1, 2))
        Xi = jnp.tile(jnp.asarray(X0)[None], (N + 1, 1))
        Ui = jnp.zeros((N, NU))
        s1 = solve_ocp(funcs, dims, b, theta, jnp.asarray(X0), Xi, Ui,
                       IPOptions(max_iter=40, tol=1e-7))
        s2 = solve_ocp(funcs, dims, b, theta, jnp.asarray(X0), Xi, Ui,
                       IPOptions(max_iter=40, tol=1e-7, riccati_unroll=N))
        assert bool(s1.converged) and bool(s2.converged)
        np.testing.assert_allclose(np.asarray(s1.U), np.asarray(s2.U),
                                   rtol=1e-4, atol=1e-5)

    def test_chol_small_matches_numpy(self):
        from hilo_mpc_tpu.ops.smallalg import chol_small
        rng = np.random.default_rng(11)
        for n in (1, 2, 3, 5, 6, 9):
            M = rng.standard_normal((4, n, n))
            G = M @ np.swapaxes(M, 1, 2) + n * np.eye(n)
            L = np.asarray(chol_small(jnp.asarray(G)))
            want = np.linalg.cholesky(G)
            np.testing.assert_allclose(L, want, rtol=2e-5, atol=2e-5)

    def test_solve_small_general_and_vector_rhs(self):
        from hilo_mpc_tpu.ops.smallalg import solve_small
        rng = np.random.default_rng(13)
        for n in (1, 2, 3, 4):
            G = rng.standard_normal((6, n, n)) + 2 * np.eye(n)  # not symmetric
            y = rng.standard_normal((6, n))
            got = np.asarray(solve_small(jnp.asarray(G), jnp.asarray(y)))
            want = np.linalg.solve(G, y[..., None])[..., 0]
            np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    def test_solve_small_huge_norm_no_overflow(self):
        # f32 det overflow regression: adjugate solves must be scale-invariant
        from hilo_mpc_tpu.ops.smallalg import solve_small
        for n in (2, 3):
            G = jnp.asarray(5e12 * np.eye(n), jnp.float32)
            got = np.asarray(solve_small(G, jnp.ones(n, jnp.float32)))
            np.testing.assert_allclose(got, np.full(n, 2e-13), rtol=1e-5)

    def test_solve_psd_small_unrolled_n4_to_n6(self):
        from hilo_mpc_tpu.ops.smallalg import solve_psd_small
        rng = np.random.default_rng(5)
        for n in (4, 5, 6):
            M = rng.standard_normal((7, n, n))
            G = (M @ np.swapaxes(M, 1, 2) + n * np.eye(n)).astype(np.float32)
            rhs = rng.standard_normal((7, n, 3)).astype(np.float32)
            got = np.asarray(solve_psd_small(jnp.asarray(G), jnp.asarray(rhs)))
            np.testing.assert_allclose(got, np.linalg.solve(G, rhs),
                                       rtol=2e-3, atol=2e-3)
