"""Pallas kernel tests (interpreter mode on CPU): the batched box-QP FGM kernel must
match the XLA reference and the interior-point solution."""
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
