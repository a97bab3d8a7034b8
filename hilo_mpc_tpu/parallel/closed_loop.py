"""Fused on-device closed loop: controller solve + plant step inside one lax.scan.

SURVEY.md §3.3's TPU mapping of the reference's SimpleControlLoop: "this whole loop is
the rollout; batched over scenarios it becomes one lax.scan whose body fuses
controller-solve + plant-step". Thousands of closed-loop simulations (e.g. controller
tuning sweeps, scenario studies, Monte-Carlo verification of chance constraints) run
without the device ever syncing with the host; warm starts thread through the scan
carry exactly as they do step-to-step in deployment.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ClosedLoopResult(NamedTuple):
    X: jnp.ndarray           # (B, steps+1, nx) plant states
    U: jnp.ndarray           # (B, steps, nu) applied inputs
    converged: jnp.ndarray   # (B, steps) per-step solver convergence
    iterations: jnp.ndarray  # (B, steps)


def fused_closed_loop_fn(nmpc, plant_model, steps: int,
                         plant_p: Optional[np.ndarray] = None,
                         process_noise_std: Optional[np.ndarray] = None):
    """Build a jitted fn(x0_batch[, key]) -> ClosedLoopResult.

    The controller's OCP is re-solved every step (warm-started from the previous
    shifted solution); the plant is stepped with the first control move. Assumes
    time-invariant references/tvp over the run (theta row 0 reused each step).
    """
    from ..ops.ip_solver import solve_ocp

    if not nmpc.is_setup():
        raise RuntimeError("nmpc must be set up")
    if not plant_model.is_setup():
        raise RuntimeError("plant model must be set up (plant.setup(dt=...))")
    if plant_model.n_p and plant_p is None:
        raise ValueError("plant model has parameters; pass plant_p=")
    dtype = nmpc._solver_dtype
    theta = jnp.asarray(nmpc._assemble_theta(None, None, None), dtype)
    solver = partial(solve_ocp, nmpc._funcs, nmpc._dims,
                     options=nmpc._ip_opts, fix_x0=True)
    bounds = nmpc._bounds
    plant_step = plant_model.step_fn_raw
    p_plant = jnp.asarray(plant_p if plant_p is not None
                          else np.zeros(plant_model.n_p), dtype)
    dt = plant_model.dt
    nx, nu = plant_model.n_x, plant_model.n_u
    nz = plant_model.n_z
    sx = jnp.asarray(nmpc._x_scaling, dtype)
    su = jnp.asarray(nmpc._u_scaling, dtype)
    aug = nmpc._augment_du
    noise = (None if process_noise_std is None
             else jnp.asarray(process_noise_std, dtype))

    def solver_x0(x_plant, u_old):
        parts = [x_plant / sx]
        if aug:
            parts.append(u_old / su)
        if nmpc._path_following:
            parts.append(jnp.zeros(1, dtype))
        if nmpc._min_time is not None:
            parts.append(jnp.full((1,), nmpc._dt, dtype))
        return jnp.concatenate(parts)

    def one_scenario(x0, key):
        xs0 = solver_x0(x0, jnp.zeros(nu, dtype))
        X_init = nmpc._rollout_guess_jit(
            xs0, theta, jnp.zeros((nmpc._dims.N, nmpc._dims.nu), dtype))
        U_init = jnp.zeros((nmpc._dims.N, nmpc._dims.nu), dtype)

        def body(carry, k):
            x, u_old, Xw, Uw, key = carry
            xs0 = solver_x0(x, u_old)
            Xw = Xw.at[0].set(xs0)
            sol = solver(bounds, theta, xs0, Xw, Uw)
            if aug:
                u0 = sol.X[1, nx:nx + nu] * su
            else:
                u0 = sol.U[0, :nu] * su
            x_next, _, _, _ = plant_step(x, jnp.zeros(nz, dtype), u0, p_plant,
                                         k * dt, dt)
            if noise is not None:
                key, sub = jax.random.split(key)
                x_next = x_next + noise * jax.random.normal(sub, (nx,), dtype)
            # shift warm start
            Xw_next = jnp.concatenate([sol.X[1:], sol.X[-1:]], axis=0)
            Uw_next = jnp.concatenate([sol.U[1:], sol.U[-1:]], axis=0)
            out = (x_next, u0, sol.converged, sol.iterations)
            return (x_next, u0, Xw_next, Uw_next, key), out

        (_, _, _, _, _), (X_traj, U_traj, conv, iters) = jax.lax.scan(
            body, (x0, jnp.zeros(nu, dtype), X_init, U_init, key),
            jnp.arange(steps, dtype=dtype))
        X_full = jnp.concatenate([x0[None], X_traj], axis=0)
        return ClosedLoopResult(X=X_full, U=U_traj, converged=conv,
                                iterations=iters)

    @jax.jit
    def run(x0_batch, key=None):
        x0_batch = jnp.asarray(x0_batch, dtype)
        B = x0_batch.shape[0]
        keys = (jax.random.split(key, B) if key is not None
                else jnp.zeros((B, 2), jnp.uint32))
        return jax.vmap(one_scenario)(x0_batch, keys)

    return run


class ClosedLoopEKFResult(NamedTuple):
    X: jnp.ndarray           # (B, steps+1, nx) TRUE plant states
    X_est: jnp.ndarray       # (B, steps, nx) EKF estimates fed back
    U: jnp.ndarray           # (B, steps, nu) applied inputs
    converged: jnp.ndarray   # (B, steps)
    iterations: jnp.ndarray  # (B, steps)


def fused_closed_loop_ekf_fn(nmpc, plant_model, ekf, steps: int,
                             plant_p: Optional[np.ndarray] = None,
                             process_noise_std: Optional[np.ndarray] = None,
                             meas_noise_std: Optional[np.ndarray] = None):
    """Fused loop with an EKF observer in the feedback path: controller solve
    + plant step + measurement + EKF predict/update, all inside one lax.scan
    body (SURVEY §3.3's TPU mapping of SimpleControlLoop WITH an observer —
    reference: control_loop.py observers, modules/estimator KF path). The
    controller only ever sees the estimate; the true state is returned for
    estimation-error studies.

    ``ekf`` must be a set-up KalmanFilter/ExtendedKalmanFilter on the
    controller's model. Returns fn(x0_batch, x_est0, P0[, key]) ->
    ClosedLoopEKFResult; x0_batch is the TRUE initial state batch.
    """
    from ..ops.ip_solver import solve_ocp

    if not nmpc.is_setup():
        raise RuntimeError("nmpc must be set up")
    if not plant_model.is_setup():
        raise RuntimeError("plant model must be set up (plant.setup(dt=...))")
    if plant_model.n_p and plant_p is None:
        raise ValueError("plant model has parameters; pass plant_p=")
    dtype = nmpc._solver_dtype
    theta = jnp.asarray(nmpc._assemble_theta(None, None, None), dtype)
    solver = partial(solve_ocp, nmpc._funcs, nmpc._dims,
                     options=nmpc._ip_opts, fix_x0=True)
    bounds = nmpc._bounds
    plant_step = plant_model.step_fn_raw
    meas_fn = plant_model.meas_fn()
    p_plant = jnp.asarray(plant_p if plant_p is not None
                          else np.zeros(plant_model.n_p), dtype)
    ekf_step = ekf.step_fn()
    p_ekf = jnp.asarray(ekf._p_or_default(None), dtype)
    dt = plant_model.dt
    nx, nu, nz = plant_model.n_x, plant_model.n_u, plant_model.n_z
    sx = jnp.asarray(nmpc._x_scaling, dtype)
    su = jnp.asarray(nmpc._u_scaling, dtype)
    aug = nmpc._augment_du
    w_std = (None if process_noise_std is None
             else jnp.asarray(process_noise_std, dtype))
    v_std = (None if meas_noise_std is None
             else jnp.asarray(meas_noise_std, dtype))

    def solver_x0(x_est, u_old):
        parts = [x_est / sx]
        if aug:
            parts.append(u_old / su)
        if nmpc._path_following:
            parts.append(jnp.zeros(1, dtype))
        if nmpc._min_time is not None:
            parts.append(jnp.full((1,), nmpc._dt, dtype))
        return jnp.concatenate(parts)

    def one_scenario(x0_true, x_est0, P0, key):
        xs0 = solver_x0(x_est0, jnp.zeros(nu, dtype))
        X_init = nmpc._rollout_guess_jit(
            xs0, theta, jnp.zeros((nmpc._dims.N, nmpc._dims.nu), dtype))
        U_init = jnp.zeros((nmpc._dims.N, nmpc._dims.nu), dtype)

        def body(carry, k):
            x_true, x_est, P, u_old, Xw, Uw, key = carry
            xs0 = solver_x0(x_est, u_old)
            Xw = Xw.at[0].set(xs0)
            sol = solver(bounds, theta, xs0, Xw, Uw)
            if aug:
                u0 = sol.X[1, nx:nx + nu] * su
            else:
                u0 = sol.U[0, :nu] * su
            x_next, _, _, _ = plant_step(x_true, jnp.zeros(nz, dtype), u0,
                                         p_plant, k * dt, dt)
            if w_std is not None:
                key, sub = jax.random.split(key)
                x_next = x_next + w_std * jax.random.normal(sub, (nx,), dtype)
            y = jnp.atleast_1d(meas_fn(x_next, jnp.zeros(nz, dtype), u0,
                                       p_plant, (k + 1) * dt))
            if v_std is not None:
                key, sub = jax.random.split(key)
                y = y + v_std * jax.random.normal(sub, y.shape, dtype)
            x_est_next, P_next, _ = ekf_step(x_est, P, u0, p_ekf, y, k * dt)
            Xw_next = jnp.concatenate([sol.X[1:], sol.X[-1:]], axis=0)
            Uw_next = jnp.concatenate([sol.U[1:], sol.U[-1:]], axis=0)
            out = (x_next, x_est_next, u0, sol.converged, sol.iterations)
            return ((x_next, x_est_next, P_next, u0, Xw_next, Uw_next, key),
                    out)

        _, (X_traj, Xe_traj, U_traj, conv, iters) = jax.lax.scan(
            body, (x0_true, x_est0, P0, jnp.zeros(nu, dtype), X_init, U_init,
                   key),
            jnp.arange(steps, dtype=dtype))
        X_full = jnp.concatenate([x0_true[None], X_traj], axis=0)
        return ClosedLoopEKFResult(X=X_full, X_est=Xe_traj, U=U_traj,
                                   converged=conv, iterations=iters)

    @jax.jit
    def run(x0_batch, x_est0_batch, P0, key=None):
        x0_batch = jnp.asarray(x0_batch, dtype)
        x_est0_batch = jnp.asarray(x_est0_batch, dtype)
        B = x0_batch.shape[0]
        P0 = jnp.asarray(P0, dtype)
        P0_b = (jnp.broadcast_to(P0, (B, nx, nx)) if P0.ndim == 2 else P0)
        keys = (jax.random.split(key, B) if key is not None
                else jnp.zeros((B, 2), jnp.uint32))
        return jax.vmap(one_scenario)(x0_batch, x_est0_batch, P0_b, keys)

    return run
