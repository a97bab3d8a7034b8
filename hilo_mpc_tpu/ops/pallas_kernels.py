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


# ---------------------------------------------------------------------------
# Fused batched Riccati LQ sweep (the NMPC/MHE KKT factor+solve hot op)
# ---------------------------------------------------------------------------


def riccati_lq_pallas(A, B, Q, S, R, q, r, c, P_term, p_term, dx0,
                      reg: float = 1e-8, tile_b: Optional[int] = None,
                      interpret: Optional[bool] = None, pack: int = 8):
    """Batched stagewise LQ solve as ONE Pallas kernel.

    Solves the same equality-constrained LQ problem as `ops.riccati.solve_lq`
    for a whole batch at once: backward Riccati recursion + forward affine
    rollout, with every per-stage matrix entry held as a batch vector in
    VMEM/registers and all stage/index loops unrolled at trace time.
    The XLA formulation (even fully unrolled) re-materializes each intermediate
    to HBM between fusions; here the entire chain stays on-chip, so the kernel
    reads each input exactly once and writes only the results.

    ``pack`` sets the sublane packing of each per-stage feature: ``pack=1``
    holds a feature as a (1, tile_b) lane vector — every VPU op then uses 1 of
    8 sublane rows of its VREGs (≤12.5% VPU lane utilization by construction).
    ``pack=8`` (default) reshapes each tile of ``8*tile_b`` scenarios into
    (8, tile_b) so a feature fills whole (8, 128) VREGs — 8× denser VPU issue
    for identical math (A/B-measured in tools/roofline.py). Results are
    bit-comparable; only the layout changes.

    Shapes (Bt = batch): A (Bt,N,nx,nx), B (Bt,N,nx,nu), Q (Bt,N,nx,nx),
    S (Bt,N,nu,nx), R (Bt,N,nu,nu), q (Bt,N,nx), r (Bt,N,nu), c (Bt,N,nx),
    P_term (Bt,nx,nx), p_term (Bt,nx), dx0 (Bt,nx).
    Returns (dX (Bt,N+1,nx), dU (Bt,N,nu), lam (Bt,N,nx), K (Bt,N,nu,nx),
    kff (Bt,N,nu), cost_red (Bt,)).

    The control-space Schur complement G (nu x nu) is factorized by an
    unrolled Cholesky + substitution (exact, fusable); `reg` is added to its
    diagonal as in the XLA path. Intended for small nx/nu (<= ~6) — the staple
    sizes of process-control OCPs; larger blocks should use `solve_lq`, whose
    matmuls then amortize.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Bt, N, nx, nu = A.shape[0], A.shape[1], A.shape[2], B.shape[3]
    if tile_b is None:
        if interpret:
            # no hardware lane constraint in emulation — keep padding small
            tile_b = min(64, _round_up(max(Bt, 1), 8) // max(1, pack))
            tile_b = max(tile_b, 1)
        else:
            # keep the double-buffered block pipeline inside the default 16MB
            # scoped-VMEM budget: pack=8 holds 8x the rows per lane column, so
            # halve the lane tile (measured: tile 512 @ pack 8 trips the 16MB
            # ceiling at N=20; tile 256 fits with headroom)
            tile_b = 256 if pack >= 8 else 512
    f32 = jnp.float32
    # pack scenarios into (pack, tile_b) sublane x lane tiles; one grid step
    # processes pack*tile_b scenarios
    Bpad = _round_up(max(Bt, 1), pack * tile_b)
    lanes = Bpad // pack            # lane extent of the packed arrays
    ntiles = lanes // tile_b

    def to_feat(x, nfeat, pad_eye=False):
        # (Bt, N, ...) -> (N, nfeat*pack, lanes): scenario b = t*pack*tile_b +
        # s*tile_b + l lands at [row i*pack+s, col t*tile_b+l] — each feature
        # fills whole (pack, tile_b) sublane tiles instead of a 1-row stripe
        x = jnp.asarray(x, f32).reshape(Bt, N, nfeat)
        if pad_eye and Bpad > Bt:
            # padded scenarios: R = I so the unrolled Cholesky stays finite
            n_ = int(round(np.sqrt(nfeat)))
            eye = jnp.tile(jnp.eye(n_, dtype=f32).reshape(1, 1, nfeat),
                           (Bpad - Bt, N, 1))
            x = jnp.concatenate([x, eye], axis=0)
        else:
            x = jnp.pad(x, ((0, Bpad - Bt), (0, 0), (0, 0)))
        x = x.reshape(ntiles, pack, tile_b, N, nfeat)
        return x.transpose(3, 4, 1, 0, 2).reshape(N, nfeat * pack, lanes)

    def to_feat1(x, nfeat):
        x = jnp.asarray(x, f32).reshape(Bt, nfeat)
        x = jnp.pad(x, ((0, Bpad - Bt), (0, 0)))
        x = x.reshape(ntiles, pack, tile_b, nfeat)
        return x.transpose(3, 1, 0, 2).reshape(nfeat * pack, lanes)

    A_f = to_feat(A, nx * nx)
    B_f = to_feat(B, nx * nu)
    Q_f = to_feat(Q, nx * nx)
    S_f = to_feat(S, nu * nx)
    R_f = to_feat(R, nu * nu, pad_eye=True)
    q_f = to_feat(q, nx)
    r_f = to_feat(r, nu)
    c_f = to_feat(c, nx)
    Pt_f = to_feat1(P_term, nx * nx)
    pt_f = to_feat1(p_term, nx)
    dx0_f = to_feat1(dx0, nx)

    def kernel(A_ref, B_ref, Q_ref, S_ref, R_ref, q_ref, r_ref, c_ref,
               Pt_ref, pt_ref, dx0_ref,
               dX_ref, dU_ref, lam_ref, K_ref, kff_ref, dec_ref,
               Pn_s, pn_s):
        def rd(ref, k, idx):
            return ref[k, idx * pack:(idx + 1) * pack, :]   # (pack, TB)

        def rd1(ref, idx):
            return ref[idx * pack:(idx + 1) * pack, :]

        # ---- backward sweep (unrolled over stages and indices) ----
        P = [[rd1(Pt_ref, i * nx + j) for j in range(nx)] for i in range(nx)]
        p = [rd1(pt_ref, i) for i in range(nx)]
        dec = jnp.zeros_like(p[0])
        for k in range(N - 1, -1, -1):
            Ak = [[rd(A_ref, k, i * nx + j) for j in range(nx)]
                  for i in range(nx)]
            Bk = [[rd(B_ref, k, i * nu + j) for j in range(nu)]
                  for i in range(nx)]
            # Pc_p = P c + p ; PA = P A ; PB = P B
            ck = [rd(c_ref, k, i) for i in range(nx)]
            Pc_p = [sum(P[i][l] * ck[l] for l in range(nx)) + p[i]
                    for i in range(nx)]
            PA = [[sum(P[i][l] * Ak[l][j] for l in range(nx))
                   for j in range(nx)] for i in range(nx)]
            PB = [[sum(P[i][l] * Bk[l][j] for l in range(nx))
                   for j in range(nu)] for i in range(nx)]
            # G = R + B^T PB (sym + reg I); H_ux = S + B^T PA; g_u = r + B^T Pc_p
            G = [[rd(R_ref, k, i * nu + j)
                  + sum(Bk[l][i] * PB[l][j] for l in range(nx))
                  for j in range(nu)] for i in range(nu)]
            G = [[0.5 * (G[i][j] + G[j][i]) + (reg if i == j else 0.0)
                  for j in range(nu)] for i in range(nu)]
            Hux = [[rd(S_ref, k, i * nx + j)
                    + sum(Bk[l][i] * PA[l][j] for l in range(nx))
                    for j in range(nx)] for i in range(nu)]
            g_u = [rd(r_ref, k, i)
                   + sum(Bk[l][i] * Pc_p[l] for l in range(nx))
                   for i in range(nu)]
            # solve G X = [Hux | g_u] by unrolled Cholesky + substitution
            L = [[None] * nu for _ in range(nu)]
            for i in range(nu):
                for j in range(i + 1):
                    sgl = G[i][j]
                    for l in range(j):
                        sgl = sgl - L[i][l] * L[j][l]
                    L[i][j] = jnp.sqrt(sgl) if i == j else sgl / L[j][j]
            rhs = [Hux[i] + [g_u[i]] for i in range(nu)]   # nu x (nx+1)
            ncol = nx + 1
            Yc = [[None] * ncol for _ in range(nu)]
            for i in range(nu):
                for m in range(ncol):
                    acc = rhs[i][m]
                    for l in range(i):
                        acc = acc - L[i][l] * Yc[l][m]
                    Yc[i][m] = acc / L[i][i]
            Xc = [[None] * ncol for _ in range(nu)]
            for i in range(nu - 1, -1, -1):
                for m in range(ncol):
                    acc = Yc[i][m]
                    for l in range(i + 1, nu):
                        acc = acc - L[l][i] * Xc[l][m]
                    Xc[i][m] = acc / L[i][i]
            Kk = [[-Xc[i][j] for j in range(nx)] for i in range(nu)]
            kffk = [-Xc[i][nx] for i in range(nu)]
            # stash gains and the (P_{k+1}, p_{k+1}) pair for the forward pass
            for i in range(nu):
                for j in range(nx):
                    f = i * nx + j
                    K_ref[k, f * pack:(f + 1) * pack, :] = Kk[i][j]
                kff_ref[k, i * pack:(i + 1) * pack, :] = kffk[i]
            for i in range(nx):
                for j in range(nx):
                    f = i * nx + j
                    Pn_s[k, f * pack:(f + 1) * pack, :] = P[i][j]
                pn_s[k, i * pack:(i + 1) * pack, :] = p[i]
            # value-function update
            P_new = [[rd(Q_ref, k, i * nx + j)
                      + sum(Ak[l][i] * PA[l][j] for l in range(nx))
                      + sum(Hux[l][i] * Kk[l][j] for l in range(nu))
                      for j in range(nx)] for i in range(nx)]
            P = [[0.5 * (P_new[i][j] + P_new[j][i]) for j in range(nx)]
                 for i in range(nx)]
            p = [rd(q_ref, k, i)
                 + sum(Ak[l][i] * Pc_p[l] for l in range(nx))
                 + sum(Hux[l][i] * kffk[l] for l in range(nu))
                 for i in range(nx)]
            dec = dec - 0.5 * sum(kffk[i] * g_u[i] for i in range(nu))
        dec_ref[:, :] = dec

        # ---- forward rollout ----
        def rdp(ref, k, f):
            return ref[k, f * pack:(f + 1) * pack, :]

        dx = [rd1(dx0_ref, i) for i in range(nx)]
        for i in range(nx):
            dX_ref[0, i * pack:(i + 1) * pack, :] = dx[i]
        for k in range(N):
            Ak = [[rd(A_ref, k, i * nx + j) for j in range(nx)]
                  for i in range(nx)]
            Bk = [[rd(B_ref, k, i * nu + j) for j in range(nu)]
                  for i in range(nx)]
            Kk = [[rdp(K_ref, k, i * nx + j) for j in range(nx)]
                  for i in range(nu)]
            du = [sum(Kk[i][j] * dx[j] for j in range(nx))
                  + rdp(kff_ref, k, i) for i in range(nu)]
            dx_n = [sum(Ak[i][j] * dx[j] for j in range(nx))
                    + sum(Bk[i][j] * du[j] for j in range(nu))
                    + rd(c_ref, k, i) for i in range(nx)]
            lam = [sum(rdp(Pn_s, k, i * nx + j) * dx_n[j]
                       for j in range(nx))
                   + rdp(pn_s, k, i) for i in range(nx)]
            for i in range(nu):
                dU_ref[k, i * pack:(i + 1) * pack, :] = du[i]
            for i in range(nx):
                dX_ref[k + 1, i * pack:(i + 1) * pack, :] = dx_n[i]
                lam_ref[k, i * pack:(i + 1) * pack, :] = lam[i]
            dx = dx_n

    grid = (ntiles,)

    def spec3(nfeat):
        return pl.BlockSpec((N, nfeat * pack, tile_b), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(nfeat):
        return pl.BlockSpec((nfeat * pack, tile_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((N + 1, nx * pack, lanes), f32),   # dX
        jax.ShapeDtypeStruct((N, nu * pack, lanes), f32),       # dU
        jax.ShapeDtypeStruct((N, nx * pack, lanes), f32),       # lam
        jax.ShapeDtypeStruct((N, nu * nx * pack, lanes), f32),  # K
        jax.ShapeDtypeStruct((N, nu * pack, lanes), f32),       # kff
        jax.ShapeDtypeStruct((pack, lanes), f32),               # cost_red
    )
    out_specs = (
        pl.BlockSpec((N + 1, nx * pack, tile_b), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        spec3(nu), spec3(nx), spec3(nu * nx), spec3(nu),
        pl.BlockSpec((pack, tile_b), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    )
    dX, dU, lam, K, kff, dec = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec3(nx * nx), spec3(nx * nu), spec3(nx * nx),
                  spec3(nu * nx), spec3(nu * nu), spec3(nx), spec3(nu),
                  spec3(nx), spec2(nx * nx), spec2(nx), spec2(nx)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N, nx * nx * pack, tile_b), f32),   # P_{k+1}/stage
            pltpu.VMEM((N, nx * pack, tile_b), f32),        # p_{k+1}/stage
        ],
        interpret=interpret,
    )(A_f, B_f, Q_f, S_f, R_f, q_f, r_f, c_f, Pt_f, pt_f, dx0_f)

    def back(x, shape, nfeat):
        # (d0, nfeat*pack, lanes) -> (Bt, d0, nfeat) -> shape
        d0 = x.shape[0]
        x = x.reshape(d0, nfeat, pack, ntiles, tile_b)
        x = x.transpose(3, 2, 4, 0, 1).reshape(Bpad, d0, nfeat)
        return x[:Bt].reshape(shape)

    return (back(dX, (Bt, N + 1, nx), nx), back(dU, (Bt, N, nu), nu),
            back(lam, (Bt, N, nx), nx), back(K, (Bt, N, nu, nx), nu * nx),
            back(kff, (Bt, N, nu), nu),
            back(dec.reshape(1, pack, lanes), (Bt,), 1))
