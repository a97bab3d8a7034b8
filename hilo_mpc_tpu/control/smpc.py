"""Stochastic NMPC with GP uncertainty propagation.

Rebuild of the reference's SMPC (reference: hilo_mpc/modules/controller/mpc.py:
2462-2814): a deterministic surrogate model carries mean states mu and covariance
states vec(P); covariance propagates through the linearized closed loop

    P+ = A_cl P A_clᵀ + Bw Kd0(mu, u) Bwᵀ,   A_cl = Fx + Fu K_fb,

where F(x, u) = f(x, u) + Bw d(x, u) is the FULL mean map (nominal dynamics plus
GP means mixed in by the disturbance matrix Bw) and Kd0 the diagonal of the GP
posterior variances along the predicted mean. This is algebraically identical to
the reference's block form (`_create_deterministic_surrogate`, mpc.py:2512-2614)

    K+ = [Jf Bw] [[Kz, Kz Jgᵀ], [Jg Kz, Kd0 + Jg Kz Jgᵀ]] [Jf Bw]ᵀ
       = (Jf + Bw Jg) Kz (Jf + Bw Jg)ᵀ + Bw Kd0 Bwᵀ,

with Kz = [I; K] Kx [I; K]ᵀ — i.e. the GP/state cross-covariance (Kz Jgᵀ) and the
input-dependent GP output covariance (Jg Kz Jgᵀ) are captured exactly, because
jax.jacfwd differentiates THROUGH the GP means inside the mean map (the reference
needs the explicit block algebra only because it assembles CasADi Jacobians
separately). Chance constraints use the erfinv back-off (mpc.py:2623-2645):
Pr(x_i <= ub) >= p  ⇔  mu_i + κ_p sqrt(P_ii) <= ub, κ_p = sqrt(2) erfinv(2p - 1).

The surrogate is a plain discrete Model over [mu; vec(P)], so the whole stochastic
controller rides the standard NMPC/Riccati-IP machinery (and batches/shards like any
NMPC — scenario-batched stochastic MPC is BASELINE.json configs[4]).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.integrators import IntegratorSpec, make_step
from ..core.model import Model
from .nmpc import NMPC


def chance_backoff(level: float) -> float:
    """kappa_p = sqrt(2) * erfinv(2p - 1)."""
    from scipy.special import erfinv

    if not 0.5 <= level < 1.0:
        raise ValueError("chance constraint level must be in [0.5, 1)")
    return float(np.sqrt(2.0) * erfinv(2.0 * level - 1.0))


class SMPC(NMPC):
    """Stochastic MPC: NMPC over a mean+covariance surrogate of ``model``.

    Parameters
    ----------
    model:
        nominal dynamic model (continuous or discrete).
    gps:
        dict mapping a state name to a fitted GaussianProcess modeling an additive
        discrete-time disturbance on that state, OR a list of GaussianProcesses
        combined with ``disturbance_matrix``; the GPs' features must be model
        states/inputs. Mean enters the surrogate dynamics, variance drives the
        covariance propagation.
    disturbance_matrix:
        optional (n_x, n_gps) matrix B mixing the GP outputs into the state
        update, x+ = f(x,u) + B d(x,u) (reference: the ``B`` argument of
        SMPC.__init__ and ``Bw`` in ``_create_deterministic_surrogate``,
        mpc.py:2466,2512-2614). When ``gps`` is a dict and this is omitted, B is
        the unit selector onto the named state rows.
    feedback_gain:
        optional (n_u, n_x) ancillary feedback K (u = u_ff - K (x - mu)) tightening
        the predicted covariance (reference: K_gain, mpc.py:2512).
    """

    _controller_type = "SMPC"

    def __init__(self, model: Model, gps: Optional[Dict[str, object]] = None,
                 feedback_gain=None, dt: Optional[float] = None,
                 integration_method: str = "rk4", disturbance_matrix=None,
                 **kwargs):
        self._base_model = model.copy(keep_solution=False)
        nx = model.n_x
        if isinstance(gps, dict) or gps is None:
            self._gps = list((gps or {}).values())
            rows = []
            for nm in (gps or {}):
                if nm not in model.dynamical_states:
                    raise ValueError(f"{nm!r} is not a model state")
                rows.append(model.dynamical_states.index(nm))
            if disturbance_matrix is None:
                B_w = np.zeros((nx, len(rows)))
                for j, i in enumerate(rows):
                    B_w[i, j] = 1.0
            else:
                B_w = np.atleast_2d(np.asarray(disturbance_matrix, dtype=float))
        else:
            self._gps = list(gps)
            if disturbance_matrix is None:
                raise ValueError(
                    "a list of GPs requires disturbance_matrix (n_x, n_gps)")
            B_w = np.atleast_2d(np.asarray(disturbance_matrix, dtype=float))
        if self._gps and B_w.shape != (nx, len(self._gps)):
            raise ValueError(f"disturbance_matrix shape {B_w.shape}, expected "
                             f"{(nx, len(self._gps))}")
        self._B_w = B_w
        self._K_fb = (None if feedback_gain is None
                      else np.atleast_2d(np.asarray(feedback_gain, dtype=float)))
        self._chance_specs = []
        self._surrogate_cfg = (dt, integration_method)
        surrogate = self._build_surrogate_model(dt, integration_method)
        super().__init__(surrogate, **kwargs)

    # -- surrogate construction ------------------------------------------------
    def _build_surrogate_model(self, dt, integration_method) -> Model:
        base = self._base_model
        nx, nu, n_p = base.n_x, base.n_u, base.n_p
        state_names = base.dynamical_states
        B_w = self._B_w
        gp_fns = []
        for gp in self._gps:
            fn = gp.predict_fn()
            feats = list(gp.features)
            feat_idx = []
            for f in feats:
                if f in state_names:
                    feat_idx.append(("x", state_names.index(f)))
                elif f in base.inputs:
                    feat_idx.append(("u", base.inputs.index(f)))
                else:
                    raise ValueError(f"GP feature {f!r} is not a model state/input")
            gp_fns.append((fn, feat_idx))

        spec = IntegratorSpec(
            method="discrete" if base.discrete else integration_method)
        core = make_step(base.ode_fn(), base.alg_fn(), nx, base.n_z, spec)
        K_fb = self._K_fb
        dt_guess = dt

        def gp_eval(x, u):
            """Stacked GP posterior means and variances d(x,u), diag Kd0(x,u)."""
            mus, vs = [], []
            for fn, feat_idx in gp_fns:
                feats = jnp.stack([x[i] if kind == "x" else u[i]
                                   for kind, i in feat_idx])
                mu_gp, var = fn(feats)
                mus.append(jnp.squeeze(mu_gp))
                vs.append(jnp.squeeze(var))
            return jnp.stack(mus), jnp.stack(vs)

        def mean_step(x, u, p, t, h):
            xn, _ = core(x, jnp.zeros(base.n_z, x.dtype), u, p, t, h)
            if gp_fns:
                d, _ = gp_eval(x, u)
                xn = xn + jnp.asarray(B_w, x.dtype) @ d
            return xn

        def gp_cov(x, u):
            """Bw Kd0 Bwᵀ — the exogenous part of the covariance update."""
            if not gp_fns:
                return jnp.zeros((nx, nx), x.dtype)
            _, vs = gp_eval(x, u)
            Bx = jnp.asarray(B_w, x.dtype)
            return (Bx * vs) @ Bx.T

        surrogate = Model(name=f"{base.name}_smpc_surrogate", discrete=True,
                          time_unit=base.time_unit)
        surrogate.set_dynamical_states(list(state_names)
                                       + [f"P_{i}_{j}" for i in range(nx)
                                          for j in range(nx)])
        if nu:
            surrogate.set_inputs(base.inputs)
        if n_p:
            surrogate.set_parameters(base.parameters)

        def disc_map(xs, z, u, p, t):
            h = dt_guess if dt_guess is not None else 1.0
            mu = xs[:nx]
            P = xs[nx:].reshape(nx, nx)
            mu_next = mean_step(mu, u, p, t, h)
            A = jax.jacfwd(lambda m: mean_step(m, u, p, t, h))(mu)
            if K_fb is not None:
                B = jax.jacfwd(lambda uu: mean_step(mu, uu, p, t, h))(u)
                A = A - B @ jnp.asarray(K_fb, xs.dtype)
            P_next = A @ P @ A.T + gp_cov(mu, u)
            P_next = 0.5 * (P_next + P_next.T)
            return jnp.concatenate([mu_next, P_next.reshape(-1)])

        surrogate._ode = disc_map
        surrogate._meas = (lambda xs, z, u, p, t: jnp.atleast_1d(
            base.meas_fn()(xs[:nx], z, u, p, t)))
        surrogate._y.names = list(base.measurements)
        return surrogate

    def set_box_constraints(self, x_lb=None, x_ub=None, **kwargs):
        """Hard box bounds on the *physical* states (covariance states unbounded)."""
        nx = self._base_model.n_x
        ns = self._model.n_x

        def pad(v, fill):
            if v is None:
                return None
            v = np.broadcast_to(np.asarray(v, dtype=float).ravel(), (nx,))
            return np.concatenate([v, np.full(ns - nx, fill)])

        return super().set_box_constraints(
            x_lb=pad(x_lb, -np.inf), x_ub=pad(x_ub, np.inf), **kwargs)

    # -- chance constraints ----------------------------------------------------
    def set_box_chance_constraints(self, x_lb=None, x_ub=None, level: float = 0.95):
        """Probabilistic state bounds Pr(lb <= x <= ub) >= level via mean + back-off
        (reference: set_box_chance_constraints, mpc.py:2667-2744)."""
        kappa = chance_backoff(level)
        nx = self._base_model.n_x
        lb = (np.full(nx, -np.inf) if x_lb is None
              else np.broadcast_to(np.asarray(x_lb, float).ravel(), (nx,)).copy())
        ub = (np.full(nx, np.inf) if x_ub is None
              else np.broadcast_to(np.asarray(x_ub, float).ravel(), (nx,)).copy())
        rows_ub = np.where(np.isfinite(ub))[0]
        rows_lb = np.where(np.isfinite(lb))[0]
        n_rows = len(rows_ub) + len(rows_lb)
        if n_rows == 0:
            return self

        def g(xs, u):
            mu = xs[:nx]
            P = xs[nx:nx + nx * nx].reshape(nx, nx)
            # smooth (clip would zero the gradient w.r.t. the covariance
            # states in the floor region and stall the IP iteration)
            sig = jnp.sqrt(jnp.maximum(jnp.diagonal(P), 0.0) + 1e-10)
            rows = []
            for i in rows_ub:
                rows.append(mu[i] + kappa * sig[i] - ub[i])
            for i in rows_lb:
                rows.append(lb[i] - (mu[i] - kappa * sig[i]))
            return jnp.stack(rows)

        self.add_stage_constraint(g, ub=np.zeros(n_rows), n=n_rows,
                                  name=f"chance_{level}")
        self._chance_specs.append((lb, ub, level))
        return self

    def setup(self, options: Optional[dict] = None, **kwargs):
        options = dict(options or {})
        dt = options.get("dt", self._surrogate_cfg[0])
        if dt is None:
            raise ValueError("pass dt via SMPC(..., dt=) or setup options")
        # rebuild the surrogate with the definitive dt baked into the mean step
        if dt != self._surrogate_cfg[0]:
            self._surrogate_cfg = (dt, self._surrogate_cfg[1])
            new_surrogate = self._build_surrogate_model(*self._surrogate_cfg)
            new_surrogate._x.scaling = self._model._x.scaling
            self._model = new_surrogate
        options["integration_method"] = "discrete"
        options["dt"] = dt
        return super().setup(options=options, **kwargs)

    # -- interface shims: user supplies physical x0; covariance starts at P0 ----
    def set_initial_covariance(self, P0):
        nx = self._base_model.n_x
        P0 = np.atleast_2d(np.asarray(P0, dtype=float))
        if P0.shape != (nx, nx):
            if P0.size == nx:
                P0 = np.diag(P0.ravel())
            else:
                raise ValueError(f"P0 shape {P0.shape}, expected {(nx, nx)}")
        self._P0_smpc = P0
        return self

    def optimize(self, x0, **kwargs):
        nx = self._base_model.n_x
        x0 = np.asarray(x0, dtype=float).ravel()
        if x0.size == nx:
            P0 = getattr(self, "_P0_smpc", np.zeros((nx, nx)))
            x0 = np.concatenate([x0, P0.ravel()])
        u = super().optimize(x0, **kwargs)
        return u
