"""Embedded C codegen tests: generated+compiled controllers must match their Python
counterparts (reference capability: modules/embedded/muaompc.py)."""
import shutil

import numpy as np
import pytest

from hilo_mpc_tpu import LMPC, LQR, PID, Model
from hilo_mpc_tpu.embedded import condense_lmpc, find_c_compiler, setup_solver

try:
    find_c_compiler()
    HAS_CC = True
except RuntimeError:
    HAS_CC = False

needs_cc = pytest.mark.skipif(not HAS_CC, reason="no C compiler")


def double_integrator(dt=0.1):
    m = Model(discrete=True)
    m.set_state_space(A=[[1.0, dt], [0.0, 1.0]], B=[[0.5 * dt ** 2], [dt]],
                      C=[[1.0, 0.0]])
    return m


class TestCondensing:
    def test_condensed_qp_matches_direct_sum(self):
        rng = np.random.default_rng(0)
        A = np.array([[1.0, 0.1], [0.0, 0.9]])
        B = np.array([[0.0], [0.1]])
        Q = np.diag([2.0, 1.0])
        R = np.array([[0.5]])
        N = 5
        H, G = condense_lmpc(A, B, Q, R, None, N)
        x0 = rng.standard_normal(2)
        U = rng.standard_normal(N)
        # direct evaluation of the sum (stage costs on x_1..x_N)
        x = x0.copy()
        J = 0.0
        for k in range(N):
            x = A @ x + B @ U[k:k + 1]
            J += 0.5 * (2 * x @ Q @ x)
        J += 0.5 * np.sum(U * (np.kron(np.eye(N), 2 * R) @ U))
        # note condense_lmpc is called with 2Q/2R by the generator; here pass direct
        H2, G2 = condense_lmpc(A, B, 2 * Q, 2 * R, None, N)
        J_qp = 0.5 * U @ H2 @ U + x0 @ G2.T @ U + 0.5 * _const_term(A, 2 * Q, x0, N)
        np.testing.assert_allclose(J_qp, J, rtol=1e-10)


def _const_term(A, Qb, x0, N):
    x = x0.copy()
    tot = 0.0
    for _ in range(N):
        x = A @ x
        tot += x @ Qb @ x
    return tot


@needs_cc
class TestGeneratedControllers:
    def test_pid_c_matches_python(self):
        pid = PID(k_p=1.3, t_i=0.7, t_d=0.05)
        pid.set_output_limits(-2.0, 2.0)
        pid.setup(dt=0.1)
        pid.set_point = [1.0]
        c_step = setup_solver(pid)
        rng = np.random.default_rng(0)
        for _ in range(20):
            pv = rng.normal()
            u_py = pid.call([pv])
            u_c = c_step([pv])
            np.testing.assert_allclose(u_c, u_py, atol=1e-12)

    def test_lqr_c_matches_python(self):
        lqr = LQR(double_integrator())
        lqr.horizon = 20
        lqr.Q = np.eye(2)
        lqr.R = np.eye(1) * 0.1
        lqr.setup()
        c_step = setup_solver(lqr)
        for x in ([1.0, 0.0], [-0.5, 0.3], [0.2, -0.7]):
            np.testing.assert_allclose(c_step(x), lqr.call(x), atol=1e-12)

    def test_lmpc_c_matches_python_solver(self):
        lmpc = LMPC(double_integrator())
        lmpc.horizon = 10
        lmpc.Q = np.diag([5.0, 1.0])
        lmpc.R = np.array([[0.5]])
        lmpc.set_box_constraints(u_lb=-1.0, u_ub=1.0)
        lmpc.setup(options={"dt": 0.1, "tol": 1e-10})
        c_step = setup_solver(lmpc, fgm_iters=300)
        for x in ([1.0, 0.0], [2.0, -1.0], [-1.5, 0.5]):
            u_c = c_step(np.asarray(x))
            u_py = lmpc.optimize(np.asarray(x))
            lmpc._warm = None  # independent solves
            lmpc._u_old[:] = 0
            np.testing.assert_allclose(u_c, u_py, atol=2e-4)
