"""Pallas TPU kernels.

Hot-op kernels where hand placement beats XLA's default schedule. The headline kernel
is a batched box-constrained QP solver (projected fast gradient method) for condensed
linear MPC: the Hessian H and constraint data stay resident in VMEM across ALL FGM
iterations while a tile of scenarios streams through the MXU — the on-chip analogue of
the reference's qpoases/muAO-MPC condensed-QP path (reference:
hilo_mpc/modules/controller/mpc.py:2143-2306, modules/embedded/muaompc.py).

Problem (per scenario b): min_u 1/2 uᵀHu + (G x0_b)ᵀu  s.t. lb <= u <= ub.
FGM: u+ = clip(y - (1/L)(H y + g));  y+ = u+ + beta (u+ - u).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fgm_boxqp_batch(H, G, x0_batch, lb, ub, iters: int = 60,
                    tile_b: int = 256, u0_batch=None,
                    interpret: Optional[bool] = None):
    """Solve B box-QPs min 1/2 uᵀHu + (G x0)ᵀu with shared H, G.

    H: (n, n), G: (n, nx), x0_batch: (B, nx), lb/ub: (n,). Returns (B, n).
    Pads n to a multiple of 128 (lanes) and B to a multiple of tile_b; runs a
    Pallas kernel with one batch-tile per grid step, H resident in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = np.asarray(H, dtype=np.float32)
    G = np.asarray(G, dtype=np.float32)
    lb = np.asarray(lb, dtype=np.float32)
    ub = np.asarray(ub, dtype=np.float32)
    n, nx = H.shape[0], G.shape[1]
    x0_batch = jnp.asarray(x0_batch, jnp.float32)
    B = x0_batch.shape[0]

    # FGM constants from the (padded-safe) spectrum
    eigs = np.linalg.eigvalsh(0.5 * (H + H.T))
    L = float(eigs[-1])
    mu = float(max(eigs[0], 1e-9))
    kappa = np.sqrt(L / mu)
    beta = float((kappa - 1.0) / (kappa + 1.0))
    inv_L = float(1.0 / L)

    n_p = _round_up(n, 128)
    nx_p = _round_up(nx, 128)
    B_p = _round_up(B, tile_b)

    H_p = np.zeros((n_p, n_p), np.float32)
    H_p[:n, :n] = H
    # padded coordinates: H acts as identity so they stay at their (0) bound
    for i in range(n, n_p):
        H_p[i, i] = L
    G_p = np.zeros((n_p, nx_p), np.float32)
    G_p[:n, :nx] = G
    lb_p = np.zeros((1, n_p), np.float32)
    ub_p = np.zeros((1, n_p), np.float32)
    lb_p[0, :n] = np.where(np.isfinite(lb), lb, -1e30)
    ub_p[0, :n] = np.where(np.isfinite(ub), ub, 1e30)

    X0_p = jnp.zeros((B_p, nx_p), jnp.float32).at[:B, :nx].set(x0_batch)
    U0_p = (jnp.zeros((B_p, n_p), jnp.float32) if u0_batch is None
            else jnp.zeros((B_p, n_p), jnp.float32).at[:B, :n].set(
                jnp.asarray(u0_batch, jnp.float32)))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(x0_ref, u0_ref, H_ref, Gt_ref, lb_ref, ub_ref, out_ref):
        Hm = H_ref[:]                     # (n_p, n_p) resident in VMEM
        g = jnp.dot(x0_ref[:], Gt_ref[:],
                    preferred_element_type=jnp.float32)   # (TB, n_p)
        lbv = lb_ref[:]
        ubv = ub_ref[:]
        u = u0_ref[:]
        y = u

        def body(_, carry):
            u, y = carry
            grad = jnp.dot(y, Hm, preferred_element_type=jnp.float32) + g
            u_new = jnp.clip(y - inv_L * grad, lbv, ubv)
            y_new = u_new + beta * (u_new - u)
            return (u_new, y_new)

        u, y = jax.lax.fori_loop(0, iters, body, (u, y))
        out_ref[:] = u

    grid = (B_p // tile_b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, nx_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, n_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx_p, n_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, n_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_p, n_p), jnp.float32),
        interpret=interpret,
    )(X0_p, U0_p, jnp.asarray(H_p), jnp.asarray(G_p.T), jnp.asarray(lb_p),
      jnp.asarray(ub_p))
    return out[:B, :n]


def fgm_boxqp_batch_xla(H, G, x0_batch, lb, ub, iters: int = 60, u0_batch=None):
    """Pure-XLA reference implementation of the same FGM (for A/B comparison)."""
    # spectrum on host first (H must be a concrete array, not a tracer)
    eigs = np.linalg.eigvalsh(0.5 * (np.asarray(H) + np.asarray(H).T))
    H = jnp.asarray(H, jnp.float32)
    G = jnp.asarray(G, jnp.float32)
    lb = jnp.asarray(np.where(np.isfinite(lb), lb, -1e30), jnp.float32)
    ub = jnp.asarray(np.where(np.isfinite(ub), ub, 1e30), jnp.float32)
    x0_batch = jnp.asarray(x0_batch, jnp.float32)
    L = float(eigs[-1])
    mu = float(max(eigs[0], 1e-9))
    kappa = np.sqrt(L / mu)
    beta = float((kappa - 1.0) / (kappa + 1.0))
    inv_L = float(1.0 / L)
    g = x0_batch @ G.T
    u0 = (jnp.zeros_like(g) if u0_batch is None
          else jnp.asarray(u0_batch, jnp.float32))

    def body(_, carry):
        u, y = carry
        grad = y @ H.T + g
        u_new = jnp.clip(y - inv_L * grad, lb, ub)
        y_new = u_new + beta * (u_new - u)
        return (u_new, y_new)

    u, _ = jax.lax.fori_loop(0, iters, body, (u0, u0))
    return u
