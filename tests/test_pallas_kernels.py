"""Pallas kernel tests (interpreter mode on CPU): the batched box-QP FGM kernel must
match the XLA reference and the interior-point solution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import LMPC, Model
from hilo_mpc_tpu.ops.pallas_kernels import fgm_boxqp_batch, fgm_boxqp_batch_xla


def make_qp(n=6, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    H = M @ M.T + np.eye(n)
    G = rng.normal(size=(n, nx))
    lb = -np.ones(n)
    ub = np.ones(n)
    return H, G, lb, ub


class TestFGMKernel:
    def test_matches_xla_reference(self):
        H, G, lb, ub = make_qp()
        x0 = np.random.default_rng(1).normal(size=(17, 2))
        u_pl = fgm_boxqp_batch(H, G, x0, lb, ub, iters=200, tile_b=8)
        u_xla = np.asarray(fgm_boxqp_batch_xla(H, G, x0, lb, ub, iters=200))
        np.testing.assert_allclose(u_pl, u_xla, atol=1e-5)

    def test_matches_closed_form_unconstrained(self):
        H, G, _, _ = make_qp()
        lb = -1e3 * np.ones(6)
        ub = 1e3 * np.ones(6)
        x0 = np.random.default_rng(2).normal(size=(4, 2)) * 0.1
        u = fgm_boxqp_batch(H, G, x0, lb, ub, iters=400, tile_b=4)
        u_exact = -(np.linalg.solve(H, G @ x0.T)).T
        np.testing.assert_allclose(u, u_exact, atol=1e-4)

    def test_active_bounds(self):
        H = np.eye(3)
        G = np.eye(3)[:, :2] * 10.0
        lb, ub = -0.5 * np.ones(3), 0.5 * np.ones(3)
        x0 = np.array([[1.0, 1.0]])
        u = fgm_boxqp_batch(H, G, x0, lb, ub, iters=100, tile_b=1)
        # unconstrained optimum -G x0 = (-10, -10, 0) clips to bounds
        np.testing.assert_allclose(u[0], [-0.5, -0.5, 0.0], atol=1e-6)


class TestLMPCFastPath:
    def test_fgm_matches_interior_point(self):
        dt = 0.1
        m = Model(discrete=True)
        m.set_state_space(A=[[1.0, dt], [0.0, 1.0]], B=[[0.5 * dt ** 2], [dt]],
                          C=[[1.0, 0.0]])
        lmpc = LMPC(m)
        lmpc.horizon = 10
        lmpc.Q = np.diag([5.0, 1.0])
        lmpc.R = np.array([[0.5]])
        lmpc.set_box_constraints(u_lb=-1.0, u_ub=1.0)
        lmpc.setup(options={"dt": dt, "tol": 1e-10})
        x0s = np.array([[1.0, 0.0], [2.0, -1.0], [-1.5, 0.5], [0.3, 0.3]])
        u_fgm = lmpc.optimize_batch_fgm(x0s, iters=400)
        for i, x0 in enumerate(x0s):
            u_ip = lmpc.optimize(x0)
            lmpc._warm = None
            lmpc._u_old[:] = 0
            np.testing.assert_allclose(u_fgm[i], u_ip, atol=5e-4)


class TestRiccatiLQPallas:
    def _problem(self, Bt, N, nx, nu, seed=0):
        rng = np.random.default_rng(seed)
        A = np.eye(nx) + 0.05 * rng.standard_normal((Bt, N, nx, nx))
        B = 0.3 * rng.standard_normal((Bt, N, nx, nu))
        Q = np.tile(np.eye(nx), (Bt, N, 1, 1))
        S = 0.1 * rng.standard_normal((Bt, N, nu, nx))
        R = np.tile(0.5 * np.eye(nu), (Bt, N, 1, 1))
        q = rng.standard_normal((Bt, N, nx))
        r = rng.standard_normal((Bt, N, nu))
        c = 0.1 * rng.standard_normal((Bt, N, nx))
        Pt = np.tile(np.eye(nx), (Bt, 1, 1))
        pt = rng.standard_normal((Bt, nx))
        dx0 = rng.standard_normal((Bt, nx))
        return tuple(jnp.asarray(a, jnp.float32)
                     for a in (A, B, Q, S, R, q, r, c, Pt, pt, dx0))

    @pytest.mark.parametrize("nx,nu", [(2, 1), (3, 2), (2, 3)])
    def test_matches_solve_lq(self, nx, nu):
        from hilo_mpc_tpu.ops.pallas_kernels import riccati_lq_pallas
        from hilo_mpc_tpu.ops.riccati import solve_lq
        args = self._problem(5, 5, nx, nu)
        ref = jax.vmap(lambda *a: solve_lq(*a, reg=1e-8))(*args)
        dX, dU, lam, K, kff, dec = riccati_lq_pallas(*args, tile_b=8)
        np.testing.assert_allclose(np.asarray(dU), np.asarray(ref.dU),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(ref.dX),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lam), np.asarray(ref.lam),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(K), np.asarray(ref.K),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("Bt", [5, 130])
    def test_pack_layouts_agree(self, Bt):
        # pack=8 (full-VREG sublane packing) is a pure layout change: results
        # match the legacy pack=1 lane-stripe layout and the XLA sweeps
        from hilo_mpc_tpu.ops.pallas_kernels import riccati_lq_pallas
        from hilo_mpc_tpu.ops.riccati import solve_lq
        args = self._problem(Bt, 6, 2, 1, seed=3)
        ref = jax.vmap(lambda *a: solve_lq(*a, reg=1e-8))(*args)
        out1 = riccati_lq_pallas(*args, tile_b=8, pack=1)
        out8 = riccati_lq_pallas(*args, tile_b=8, pack=8)
        for a, b, c in zip(out1, out8, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                       rtol=1e-4, atol=1e-3)

    def test_solver_option_matches_xla_path(self):
        from hilo_mpc_tpu.ops.ip_solver import (IPOptions, OCPBounds, OCPDims,
                                                OCPFunctions, solve_ocp_batched)
        NX, NU, N, Bt = 2, 1, 10, 4
        DT = 0.2
        Am = np.array([[1.0, DT], [0.0, 1.0]])
        Bm = np.array([[0.5 * DT ** 2], [DT]])
        Qm = np.diag([1.0, 0.1])
        Rm = np.array([[0.05]])
        funcs = OCPFunctions(
            dyn=lambda x, u, th: jnp.asarray(Am, x.dtype) @ x
            + jnp.asarray(Bm, x.dtype) @ u,
            stage_cost=lambda x, u, th: x @ jnp.asarray(Qm, x.dtype) @ x
            + u @ jnp.asarray(Rm, x.dtype) @ u,
            term_cost=lambda x, th: 5.0 * (x @ jnp.asarray(Qm, x.dtype) @ x))
        dims = OCPDims(nx=NX, nu=NU, N=N)
        inf = np.inf
        bounds = OCPBounds(
            lbx=jnp.full((N + 1, NX), -inf, jnp.float32),
            ubx=jnp.full((N + 1, NX), inf, jnp.float32),
            lbu=jnp.full((N, NU), -0.7, jnp.float32),
            ubu=jnp.full((N, NU), 0.7, jnp.float32))
        x0s = jnp.asarray([[1.5, 0.0], [1.0, 0.3], [-1.0, 0.2], [0.5, -0.5]],
                          jnp.float32)
        theta = jnp.zeros((Bt, N + 1, 2), jnp.float32)
        Xi = jnp.tile(x0s[:, None, :], (1, N + 1, 1))
        Ui = jnp.zeros((Bt, N, NU), jnp.float32)
        s_ref = solve_ocp_batched(funcs, dims, bounds, theta, x0s, Xi, Ui,
                                  IPOptions(max_iter=40, tol=1e-6))
        s_pl = solve_ocp_batched(funcs, dims, bounds, theta, x0s, Xi, Ui,
                                 IPOptions(max_iter=40, tol=1e-6,
                                           pallas_riccati=True))
        assert bool(np.asarray(s_pl.converged).all())
        np.testing.assert_allclose(np.asarray(s_pl.U), np.asarray(s_ref.U),
                                   rtol=1e-4, atol=1e-4)
