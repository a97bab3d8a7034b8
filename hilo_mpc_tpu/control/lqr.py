"""Finite/infinite-horizon discrete-time LQR.

TPU-native rebuild of the reference's LinearQuadraticRegulator (reference:
hilo_mpc/modules/controller/lqr.py:34-307): the reference unrolls the Riccati iteration
symbolically into one CasADi Function; here the backward recursion is a `lax.scan`
(ops/riccati.py) and the control law u = -K x is a jitted closure. Bonus over the
reference: the infinite-horizon gain (DARE fixed point) is implemented instead of
raising NotImplementedError (lqr.py:236-244).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import Model
from ..ops.riccati import dare_solve, lqr_backward


def _check_psd(M, name):
    M = np.atleast_2d(np.asarray(M, dtype=float))
    if not np.allclose(M, M.T, atol=1e-10):
        raise ValueError(f"{name} must be symmetric")
    eigs = np.linalg.eigvalsh(M)
    if np.any(eigs < -1e-10):
        raise ValueError(f"{name} must be positive semi-definite")
    return M


class LinearQuadraticRegulator:
    """u = -K x for a discrete-time linear model."""

    _controller_type = "LQR"

    def __init__(self, model: Model, id: Optional[str] = None,
                 name: Optional[str] = None, plot_backend=None):
        if not model.is_linear:
            raise ValueError("LQR requires a linear model")
        self._model = model.copy(keep_solution=False)
        self.name = name or f"lqr_{self._model.name}"
        self._horizon: Optional[int] = None
        self._Q: Optional[np.ndarray] = None
        self._R: Optional[np.ndarray] = None
        self._K: Optional[np.ndarray] = None
        self._setup_done = False
        self._dt = model.dt or 1.0

    @property
    def horizon(self):
        return self._horizon

    @horizon.setter
    def horizon(self, N):
        if N is not None and int(N) < 1:
            raise ValueError("horizon must be >= 1 (or None for infinite horizon)")
        self._horizon = None if N is None else int(N)

    @property
    def Q(self):
        return self._Q

    @Q.setter
    def Q(self, val):
        Q = _check_psd(val, "Q")
        if Q.shape != (self._model.n_x, self._model.n_x):
            raise ValueError(f"Q shape {Q.shape}, expected "
                             f"{(self._model.n_x, self._model.n_x)}")
        self._Q = Q
        if self._setup_done:
            self._compute_gain()

    @property
    def R(self):
        return self._R

    @R.setter
    def R(self, val):
        R = _check_psd(val, "R")
        if np.any(np.linalg.eigvalsh(R) <= 0):
            raise ValueError("R must be positive definite")
        if R.shape != (self._model.n_u, self._model.n_u):
            raise ValueError(f"R shape {R.shape}, expected "
                             f"{(self._model.n_u, self._model.n_u)}")
        self._R = R
        if self._setup_done:
            self._compute_gain()

    @property
    def K(self):
        """Feedback gain (after setup)."""
        return None if self._K is None else np.array(self._K)

    feedback_gain = K

    def _discrete_AB(self):
        m = self._model
        if m.discrete:
            if m.A is not None:
                return m.A, m.B
            # linear but declared via equations: extract via jacobians
            A, B = m.jacobians(np.zeros(m.n_x), np.zeros(m.n_u))
            return np.asarray(A), np.asarray(B)
        # continuous linear model: zero-order-hold discretization via matrix exp
        A, B = m.jacobians(np.zeros(m.n_x), np.zeros(m.n_u))
        import scipy.linalg

        nx, nu = m.n_x, m.n_u
        M = np.zeros((nx + nu, nx + nu))
        M[:nx, :nx] = np.asarray(A)
        M[:nx, nx:] = np.asarray(B)
        E = scipy.linalg.expm(M * self._dt)
        return E[:nx, :nx], E[:nx, nx:]

    def _compute_gain(self):
        A, B = self._discrete_AB()
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        A_ = jnp.asarray(A, dtype)
        B_ = jnp.asarray(B, dtype)
        Q_ = jnp.asarray(self._Q, dtype)
        R_ = jnp.asarray(self._R, dtype)
        if self._horizon is None:
            K, P = dare_solve(A_, B_, Q_, R_)
            self._K = np.asarray(K)
        else:
            Ks, P0 = lqr_backward(A_, B_, Q_, R_, horizon=self._horizon)
            # receding-horizon first gain; backward_sweep returns u = +K x convention
            self._K = -np.asarray(Ks[0])
        self._P = np.asarray(P0 if self._horizon is not None else P)

    def setup(self, dt: Optional[float] = None, **kwargs):
        if dt is not None:
            self._dt = float(dt)
        if self._Q is None:
            self._Q = np.eye(self._model.n_x)
        if self._R is None:
            self._R = np.eye(self._model.n_u)
        self._compute_gain()
        self._setup_done = True
        return self

    def is_setup(self):
        return self._setup_done

    def call(self, x, **kwargs):
        if not self._setup_done:
            raise RuntimeError("call setup() first")
        x = np.asarray(x, dtype=float).ravel()
        return -(self._K @ x)

    optimize = call
    __call__ = call
