"""Whole-solve Pallas TPU kernel for the batched box-constrained NMPC interior point.

`ops/ip_solver.solve_ocp` expresses one IP iteration as ~60 XLA ops; under `vmap`
each of them round-trips its operands through HBM and the iteration is dispatch- and
bandwidth-bound, not compute-bound (measured v5e, B=131k: ~180 ns/solve/iteration vs
a ~5 ns arithmetic floor). This kernel runs the ENTIRE solve — dynamics linearization
(AD inside the kernel), cost gradients/Hessians, barrier condensation, Riccati
backward/forward sweep, fraction-to-boundary step, convergence test, barrier update —
as ONE `pallas_call`: a tile of scenarios lives in lanes, every per-stage quantity is
a `(1, tile_b)` lane vector in VMEM/registers, and nothing touches HBM between the
initial read of (theta, x0, X_init, U_init) and the final write of the solution.
Early exit is per tile: the in-kernel `while_loop` stops as soon as every lane in the
tile converged.

Supported problem class (the flagship NMPC shape — `pallas_full_supported` gates it,
callers fall back to the general XLA path otherwise):
  * box constraints only (no generic stage/terminal inequalities, no equalities),
  * no pinned (equality-bounded) controls, fix_x0=True, shared bounds across the batch,
  * pure Newton steps: mehrotra=False, n_linesearch<=1, convexify=False,
  * f32 arithmetic (the TPU-native precision; the general path covers f64).

Semantics mirror `_solve_ocp_impl` exactly (same init, same residuals, same barrier
schedule, same masking), so converged solutions match the XLA path to f32 roundoff —
`tests/test_pallas_ip.py` checks that, and the reference semantics chain through:
this kernel ≡ solve_ocp ≡ IPOPT on the reference's NLP (reference:
hilo_mpc/modules/controller/mpc.py:1778-1787 hands the same multiple-shooting NLP to
IPOPT's C++ interior point; here the "solver binary" is a Mosaic kernel).

MEASURED VERDICT (v5e, round 2, tools/bench_pallas_full.py): correct
(max|dU| ~3e-7 vs the XLA path) but SLOWER than the flagship
XLA+pallas_riccati path — 140k vs 179k solves/s at B=4096 (0.78x) and 463k vs
1385k at B=65536 (0.33x). The monolithic kernel serializes the whole IP loop
per lane tile, so it cannot overlap the AD-heavy linearization with the sweep
the way XLA's fusion+pipelining does across the batch, and its lane-vector
matmuls never reach the MXU. It therefore stays OPT-IN (`pallas_full` option,
default off); the production batched path is XLA + the fused Pallas Riccati
sweep kernel (ops/pallas_kernels.riccati_lq_pallas).

Round-3 addendum: the kernel was parametrized with the pack=8 full-VREG
sublane layout that made the standalone Riccati sweep 2.6x faster (the lane
-stripe inefficiency above was the prime suspect for the 0.33x). It is
numerically identical (interpret-mode parity tests) but its pack=8 Mosaic
compile ran >75 minutes (killed) vs 116 s at pack=1.

Round-4 RESOLUTION (2026-08-21, tools/probe_pallas_compile.py): the blocker
was pinned and the experiment completed.
  * Root cause 1 — scoped-VMEM infeasibility: at the 16 MB default the
    packed kernel's flattened-lane AD stack does not fit (N=2 pack=8 needs
    25.9 MB; N=8 pack=4 needs 17.8 MB; errors are reported FAST once the
    limit is the only problem). `vmem_mb=` raises the limit via
    pltpu.CompilerParams.
  * Root cause 2 — a residual compile-TIME pathology specific to pack=8 at
    long horizons: with vmem fixed, N=20 pack=8 still exceeds 30 min
    (killed), while pack=4 compiles (N=2: 9.9 s, N=8: 90 s, N=20: 526 s —
    strongly superlinear in N, the minimal-repro scaling curve).
  * MEASURED A/B at the flagship shape (N=20, B=65536, same day):
    pack=4 + vmem 32 MB = 495k solves/s, conv 100%, max|dU| 3.0e-7 vs the
    XLA path's 1,347k (0.37x; pack=1 was 452k). The packed layout recovers
    only ~10%, NOT the sweep kernel's 2.6x.
VERDICT: the monolithic whole-IP kernel loses to the XLA+pallas-sweep
hybrid REGARDLESS of layout — it serializes the entire IP loop per lane
tile, so the AD-heavy linearization cannot overlap the sweeps across the
batch the way XLA's fusion+pipelining does, and its lane-vector matmuls
never touch the MXU. The roofline's "~10x bytes headroom" is not reachable
by this design; the kernel stays opt-in (`pallas_full`,
`pallas_full_pack`, `pallas_vmem_mb`) as the measured record.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ip_solver import IPOptions, OCPBounds, OCPDims, OCPFunctions, OCPSolution


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _Row(NamedTuple):
    """One active box-constraint row: c = sgn * v[idx] + off <= 0."""
    kind: str     # 'u' or 'x'
    idx: int
    sgn: float    # +1 for upper-bound rows, -1 for lower-bound rows
    off: float    # -ub for upper rows, +lb for lower rows
    full_col: int  # column in the full (2nu+2nx [+2nx terminal]) row layout


def _stage_rows(bounds_np, dims: OCPDims, fix_x0: bool):
    """Active stage rows per k, in `_stage_ineq_fn` order: [u-ub; lb-u; x-ub; lb-x]."""
    lbx, ubx, lbu, ubu = bounds_np
    nx, nu, N = dims.nx, dims.nu, dims.N
    rows = []
    for k in range(N):
        rk = []
        for j in range(nu):
            if np.isfinite(ubu[k, j]):
                rk.append(_Row('u', j, 1.0, -float(ubu[k, j]), j))
        for j in range(nu):
            if np.isfinite(lbu[k, j]):
                rk.append(_Row('u', j, -1.0, float(lbu[k, j]), nu + j))
        if not (fix_x0 and k == 0):
            for i in range(nx):
                if np.isfinite(ubx[k, i]):
                    rk.append(_Row('x', i, 1.0, -float(ubx[k, i]), 2 * nu + i))
            for i in range(nx):
                if np.isfinite(lbx[k, i]):
                    rk.append(_Row('x', i, -1.0, float(lbx[k, i]),
                                   2 * nu + nx + i))
        rows.append(rk)
    term = []
    for i in range(nx):
        if np.isfinite(ubx[N, i]):
            term.append(_Row('x', i, 1.0, -float(ubx[N, i]), i))
    for i in range(nx):
        if np.isfinite(lbx[N, i]):
            term.append(_Row('x', i, -1.0, float(lbx[N, i]), nx + i))
    return rows, term


def pallas_full_supported(dims: OCPDims, bounds: OCPBounds, options: IPOptions,
                          fix_x0: bool) -> bool:
    """True iff the whole-solve kernel covers this problem configuration."""
    if dims.n_h or dims.n_hN or dims.n_e or dims.n_eN:
        return False
    if not fix_x0:
        return False
    if options.mehrotra or options.convexify or options.n_linesearch > 1:
        return False
    if options.record_iterates or options.parallel_riccati:
        return False
    lbu = np.asarray(bounds.lbu, np.float64)
    ubu = np.asarray(bounds.ubu, np.float64)
    pinned = np.isfinite(lbu) & np.isfinite(ubu) & (ubu - lbu < 1e-9)
    if pinned.any():
        return False
    return True


def solve_ocp_pallas_full(funcs: OCPFunctions, dims: OCPDims, bounds: OCPBounds,
                          theta_B, x0_B, X_B, U_B,
                          options: IPOptions = IPOptions(),
                          tile_b: Optional[int] = None,
                          interpret: Optional[bool] = None,
                          pack: int = 1,
                          vmem_mb: Optional[float] = None) -> OCPSolution:
    """Batched whole-solve kernel. Inputs: theta_B (B,N+1,nt), x0_B (B,nx),
    X_B (B,N+1,nx), U_B (B,N,nu). Returns a batched OCPSolution (leading dim B).

    ``pack`` sets the sublane packing of every per-scenario scalar: pack=1
    (default) holds each as a (1, tile_b) lane stripe (1 of 8 VREG sublane
    rows used — a structural reason this kernel loses to the XLA path);
    pack=8 reshapes each tile of ``8*tile_b`` scenarios into (8, tile_b) so
    every VPU op fills whole (8, 128) VREGs — the layout measured 2.6x
    faster on the standalone Riccati sweep (tools/roofline.py) and is
    numerically identical here (interpret-mode parity test). It is NOT the
    default because Mosaic's compile of THIS kernel at pack=8 is
    pathological (>75 min at tile 128 and >3 h at tile 256, both killed, vs
    116 s at pack=1 — measured 2026-08-21 with the 2-D flattened-lane AD
    formulation — the small Riccati
    sweep kernel compiles in ~5 s at pack=8, so the blowup is specific to
    this kernel's unrolled whole-IP body). One grid step processes
    ``pack*tile_b`` scenarios."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, nu, N = dims.nx, dims.nu, dims.N
    opt = options
    f32 = jnp.float32
    bounds_np = tuple(np.asarray(b, np.float64) for b in bounds)
    rows_k, rows_t = _stage_rows(bounds_np, dims, fix_x0=True)
    R_s = sum(len(r) for r in rows_k)
    R_t = len(rows_t)
    m_full = 2 * nu + 2 * nx
    mN_full = 2 * nx
    nt = int(theta_B.shape[-1])
    B = int(theta_B.shape[0])
    PK = int(pack)
    if tile_b is None:
        tile_b = (8 if interpret else (128 if PK >= 8 else 256))
    Bpad = _round_up(max(B, 1), PK * tile_b)
    TB = tile_b
    lanes = Bpad // PK
    ntiles = lanes // TB

    # ---- carry row offsets -------------------------------------------------
    o_X = 0
    o_U = o_X + (N + 1) * nx
    o_lam = o_U + N * nu
    o_s = o_lam + N * nx
    o_z = o_s + R_s
    o_sN = o_z + R_s
    o_zN = o_sN + R_t
    o_mu = o_zN + R_t
    o_kkt, o_it, o_conv, o_div = o_mu + 1, o_mu + 2, o_mu + 3, o_mu + 4
    K_rows = o_mu + 5

    s_off = []  # carry row of the first row of stage k's slack block
    acc = 0
    for k in range(N):
        s_off.append(acc)
        acc += len(rows_k[k])

    # ---- per-lane model derivatives (vmapped over lanes inside the kernel) --
    # Pallas kernels may not capture non-scalar constants (scaling vectors,
    # weight matrices, reference values baked into the model/cost closures).
    # `jax.closure_convert` hoists them out; `_scalarized` rebuilds each one
    # INSIDE the kernel from Python scalars (scalar constants are allowed), so
    # the kernel jaxpr is constant-free while the math is bit-identical.
    def _rebuild_const(c):
        c = np.asarray(c)
        if c.dtype.kind in "iu":
            raise NotImplementedError(
                "integer array constant captured by a model/cost function — "
                "use static Python-int indexing (see nmpc.take_static)")
        flat = c.reshape(-1)
        parts = [jnp.full((1,), float(v), f32) for v in flat]
        arr = jnp.concatenate(parts).reshape(c.shape) if flat.size else \
            jnp.zeros(c.shape, f32)
        if c.dtype.kind == "b":
            return arr > 0.5
        return arr

    def _scalarized(f, *example_args):
        # jax.closure_convert only hoists tracer-perturbed consts; numpy-derived
        # constants stay embedded in the jaxpr. Trace explicitly and replay the
        # jaxpr with in-kernel rebuilt consts instead.
        from jax import tree_util as jtu
        closed, out_shape = jax.make_jaxpr(f, return_shape=True)(*example_args)
        np_consts = [np.asarray(c) for c in closed.consts]
        out_tree = jtu.tree_structure(out_shape)

        def g(*args):
            kc = [_rebuild_const(c) for c in np_consts]
            flat_args = jtu.tree_leaves(args)
            out_flat = jax.core.eval_jaxpr(closed.jaxpr, kc, *flat_args)
            return jtu.tree_unflatten(out_tree, out_flat)

        return g

    x_ex = jnp.zeros((nx,), f32)
    u_ex = jnp.zeros((nu,), f32)
    th_ex = jnp.zeros((nt,), f32)

    # Derivatives are taken with Python loops over basis directions (jvp per
    # column) instead of jacfwd/hessian, and every output is a FLAT TUPLE of
    # (nx,)/(nu,)/scalar leaves: under the lane-vmap each leaf batches to
    # (k, lanes) with the batch dim trailing. Inner basis-vmaps or transposes
    # would create (lanes, k1, k2)-shaped intermediates whose trailing dims
    # Mosaic pads to full (8,128) tiles — measured 41 MB of scoped VMEM for a
    # single linearization, and pathological compile times.
    def _basis(n, i, dt):
        # i is a Python int, so .at[i].set would also have produced a constant
        # during make_jaxpr tracing; the concatenate form is kept because it is
        # guaranteed to stay a constant under every tracing mode (no scatter
        # primitive can appear in the kernel jaxpr), not because .at[].set was
        # observed to fail lowering here
        return jnp.concatenate(
            [jnp.full((1,), 1.0 if j == i else 0.0, dt) for j in range(n)])

    def dyn_lin_lane(x, u, th):
        F, jvp = jax.linearize(lambda xx, uu: funcs.dyn(xx, uu, th), x, u)
        zx, zu = jnp.zeros_like(x), jnp.zeros_like(u)
        colsA = tuple(jvp(_basis(nx, j, x.dtype), zu) for j in range(nx))
        colsB = tuple(jvp(zx, _basis(nu, j, x.dtype)) for j in range(nu))
        return (F,) + colsA + colsB     # each leaf (nx,): F, A[:,j], B[:,j]

    def cost_gh_lane(x, u, th):
        grad_fn = jax.grad(funcs.stage_cost, argnums=(0, 1))
        (gx, gu), dgrad = jax.linearize(
            lambda xx, uu: grad_fn(xx, uu, th), x, u)
        zx, zu = jnp.zeros_like(x), jnp.zeros_like(u)
        # Hessian columns: (Hxx[:,j], Hux[:,j]) for x-basis, (Hxu[:,j]=Hux[j,:],
        # Huu[:,j]) for u-basis
        colsx = tuple(dgrad(_basis(nx, j, x.dtype), zu) for j in range(nx))
        colsu = tuple(dgrad(zx, _basis(nu, j, x.dtype)) for j in range(nu))
        flat = (gx, gu)
        for cx, cu in colsx:
            flat += (cx, cu)
        for cx, cu in colsu:
            flat += (cx, cu)
        return flat

    def term_gh_lane(x, thN):
        grad_fn = jax.grad(funcs.term_cost, argnums=0)
        g, dgrad = jax.linearize(lambda xx: grad_fn(xx, thN), x)
        cols = tuple(dgrad(_basis(nx, j, x.dtype)) for j in range(nx))
        return (g,) + cols

    def cost_val_lane(x, u, th):
        return funcs.stage_cost(x, u, th)

    def _vmap2(f):
        """Batch f over the trailing (PK, TB) scenario tile.

        A nested vmap (sublane axis inside lanes) makes every AD intermediate
        3-D (n, PK, TB) — Mosaic compiles those pathologically (hour-plus on
        v5e, measured). Instead the tile is flattened to one PK*TB lane axis
        for the vmapped call (2-D intermediates, the round-2 compile profile)
        and the leaves are reshaped back to (n, PK, TB) so the solver algebra
        outside the AD runs on full-VREG (PK, TB) tiles."""
        fv = jax.vmap(f, in_axes=-1, out_axes=-1)

        def g(*args):
            flat = [a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))
                    for a in args]
            out = fv(*flat)
            return jax.tree.map(
                lambda o: o.reshape(o.shape[:-1] + (PK, TB)), out)

        return g

    dyn_lin_v = _vmap2(_scalarized(dyn_lin_lane, x_ex, u_ex, th_ex))
    cost_gh_v = _vmap2(_scalarized(cost_gh_lane, x_ex, u_ex, th_ex))
    term_gh_v = _vmap2(_scalarized(term_gh_lane, x_ex, th_ex))
    cost_val_v = _vmap2(_scalarized(cost_val_lane, x_ex, u_ex, th_ex))
    term_val_v = _vmap2(_scalarized(funcs.term_cost, x_ex, th_ex))

    mu0 = float(opt.mu_init)
    tol = float(opt.tol)
    reg = float(opt.reg)
    s_min = float(opt.s_min)
    kappa_eps, kappa_mu, theta_mu = (float(opt.kappa_eps), float(opt.kappa_mu),
                                     float(opt.theta_mu))
    tau_min = float(opt.tau_min)
    max_iter = int(opt.max_iter)
    denom = float(N * nx + N * m_full + mN_full)

    def kernel(valid_ref, th_ref, X0_ref, U0_ref,
               X_out, U_out, lam_out, s_out, z_out, sNzN_out, misc_out):
        valid = valid_ref[:]                                   # (PK, TB)

        def Cv(C, r):
            return C[r * PK:(r + 1) * PK, :]

        def Xv(C, k, i):
            return Cv(C, o_X + k * nx + i)

        def Uv(C, k, j):
            return Cv(C, o_U + k * nu + j)

        def lamv(C, k, i):
            return Cv(C, o_lam + k * nx + i)

        def sv(C, k, r):
            return Cv(C, o_s + s_off[k] + r)

        def zv(C, k, r):
            return Cv(C, o_z + s_off[k] + r)

        def c_rows_stage(C, k):
            """Constraint values of stage k's active rows at the carry's point."""
            vals = []
            for row in rows_k[k]:
                v = Uv(C, k, row.idx) if row.kind == 'u' else Xv(C, k, row.idx)
                vals.append(row.sgn * v + row.off)
            return vals

        def c_rows_term(C):
            return [row.sgn * Xv(C, N, row.idx) + row.off for row in rows_t]

        # ---- initial carry (mirrors _solve_ocp_impl init) --------------------
        rows0 = []
        for k in range(N + 1):
            for i in range(nx):
                rows0.append(X0_ref[k, i * PK:(i + 1) * PK, :])
        for k in range(N):
            for j in range(nu):
                rows0.append(U0_ref[k, j * PK:(j + 1) * PK, :])
        zeros = jnp.zeros((PK, TB), f32)
        rows0 += [zeros] * (N * nx)                            # lam
        # s/z init needs c0 at the initial point: build a temporary carry view
        # (row BLOCKS are (PK, TB); K_rows counts blocks, not array rows)
        C_tmp = jnp.concatenate(
            rows0 + [zeros] * (K_rows - len(rows0)), axis=0)
        s0_rows, z0_rows = [], []
        for k in range(N):
            for cval in c_rows_stage(C_tmp, k):
                s_i = jnp.maximum(jnp.abs(cval), s_min)
                s0_rows.append(s_i)
                z0_rows.append(mu0 / s_i)
        sN0_rows, zN0_rows = [], []
        for cval in c_rows_term(C_tmp):
            s_i = jnp.maximum(jnp.abs(cval), s_min)
            sN0_rows.append(s_i)
            zN0_rows.append(mu0 / s_i)
        scal = [jnp.full((PK, TB), mu0, f32),                   # mu
                jnp.full((PK, TB), 1e30, f32),                  # kkt
                zeros,                                         # it
                1.0 - valid,                                   # conv (pad lanes done)
                zeros]                                         # div
        C = jnp.concatenate(rows0 + s0_rows + z0_rows + sN0_rows + zN0_rows
                            + scal, axis=0)

        def Cvec(C, o, n):
            """n consecutive carry blocks as an (n, P, TB) scenario tile."""
            return C[o * PK:(o + n) * PK, :].reshape(n, PK, TB)

        def thv(k):
            return th_ref[k].reshape(nt, PK, TB)

        def linearize(C):
            """F, A, B, gx, gu, Hxx, Hux, Huu per stage + terminal gN, HN —
            lists of (P,TB) scenario tiles, all computed on-chip via AD.
            The lane helpers return FLAT TUPLES of (dim,P,TB) column leaves
            (see comment above dyn_lin_lane); unpack them here."""
            F, A, Bm = [], [], []
            gx, gu, Hxx, Hux, Huu = [], [], [], [], []
            for k in range(N):
                xk = Cvec(C, o_X + k * nx, nx)
                uk = Cvec(C, o_U + k * nu, nu)
                thk = thv(k)
                d = dyn_lin_v(xk, uk, thk)
                Fk, Acols, Bcols = d[0], d[1:1 + nx], d[1 + nx:1 + nx + nu]
                c = cost_gh_v(xk, uk, thk)
                gxk, guk = c[0], c[1]
                # x-basis column j: c[2+2j] = Hxx[:,j], c[3+2j] = Hux[:,j];
                # u-basis column j: c[3+2nx+2j] = Huu[:,j]
                F.append([Fk[i] for i in range(nx)])
                A.append([[Acols[j][i] for j in range(nx)]
                          for i in range(nx)])
                Bm.append([[Bcols[j][i] for j in range(nu)]
                           for i in range(nx)])
                gx.append([gxk[i] for i in range(nx)])
                gu.append([guk[j] for j in range(nu)])
                Hxx.append([[c[2 + 2 * j][i] for j in range(nx)]
                            for i in range(nx)])
                Hux.append([[c[3 + 2 * j][i] for j in range(nx)]
                            for i in range(nu)])
                Huu.append([[c[3 + 2 * nx + 2 * j][i]
                             for j in range(nu)] for i in range(nu)])
            xN = Cvec(C, o_X + N * nx, nx)
            t = term_gh_v(xN, thv(N))
            gN = [t[0][i] for i in range(nx)]
            HN = [[t[1 + j][i] for j in range(nx)] for i in range(nx)]
            return F, A, Bm, gx, gu, Hxx, Hux, Huu, gN, HN

        def body(C):
            frozen = (Cv(C, o_conv) > 0.5) | (Cv(C, o_div) > 0.5) \
                | (Cv(C, o_it) >= max_iter - 0.5)
            mu = Cv(C, o_mu)

            F, A, Bm, gx, gu, Hxx, Hux, Huu, gN, HN = linearize(C)

            # ---- KKT errors at the current iterate --------------------------
            c_all = [c_rows_stage(C, k) for k in range(N)]
            cN_all = c_rows_term(C)
            e_stat = jnp.zeros((PK, TB), f32)
            abs_mult = jnp.zeros((PK, TB), f32)     # sum |lam| + |z| + |zN|
            for k in range(N):
                # r_u = gu + Bᵀ lam + Cuᵀ z
                for j in range(nu):
                    r = gu[k][j]
                    for i in range(nx):
                        r = r + Bm[k][i][j] * lamv(C, k, i)
                    for ridx, row in enumerate(rows_k[k]):
                        if row.kind == 'u' and row.idx == j:
                            r = r + row.sgn * zv(C, k, ridx)
                    e_stat = jnp.maximum(e_stat, jnp.abs(r))
                # r_x (k >= 1): gx + Aᵀ lam - lam_{k-1} + Cxᵀ z
                if k >= 1:
                    for i in range(nx):
                        r = gx[k][i] - lamv(C, k - 1, i)
                        for l in range(nx):
                            r = r + A[k][l][i] * lamv(C, k, l)
                        for ridx, row in enumerate(rows_k[k]):
                            if row.kind == 'x' and row.idx == i:
                                r = r + row.sgn * zv(C, k, ridx)
                        e_stat = jnp.maximum(e_stat, jnp.abs(r))
                for i in range(nx):
                    abs_mult = abs_mult + jnp.abs(lamv(C, k, i))
                for ridx in range(len(rows_k[k])):
                    abs_mult = abs_mult + jnp.abs(zv(C, k, ridx))
            for i in range(nx):                     # r_xN
                r = gN[i] - lamv(C, N - 1, i)
                for ridx, row in enumerate(rows_t):
                    if row.idx == i:
                        r = r + row.sgn * Cv(C, o_zN + ridx)
                e_stat = jnp.maximum(e_stat, jnp.abs(r))
            for ridx in range(R_t):
                abs_mult = abs_mult + jnp.abs(Cv(C, o_zN + ridx))
            s_d = jnp.maximum(1.0, abs_mult / denom)
            e_stat = e_stat / s_d

            e_feas = jnp.zeros((PK, TB), f32)
            comp0 = jnp.zeros((PK, TB), f32)
            comp_mu = jnp.zeros((PK, TB), f32)
            for k in range(N):
                for i in range(nx):                 # r_dyn
                    e_feas = jnp.maximum(
                        e_feas, jnp.abs(F[k][i] - Xv(C, k + 1, i)))
                for ridx in range(len(rows_k[k])):
                    s_i, z_i = sv(C, k, ridx), zv(C, k, ridx)
                    e_feas = jnp.maximum(e_feas, jnp.abs(c_all[k][ridx] + s_i))
                    sz = s_i * z_i
                    comp0 = jnp.maximum(comp0, jnp.abs(sz))
                    comp_mu = jnp.maximum(comp_mu, jnp.abs(sz - mu))
            for ridx in range(R_t):
                s_i, z_i = Cv(C, o_sN + ridx), Cv(C, o_zN + ridx)
                e_feas = jnp.maximum(e_feas, jnp.abs(cN_all[ridx] + s_i))
                sz = s_i * z_i
                comp0 = jnp.maximum(comp0, jnp.abs(sz))
                comp_mu = jnp.maximum(comp_mu, jnp.abs(sz - mu))
            base = jnp.maximum(e_stat, e_feas)
            err0 = jnp.maximum(base, comp0 / s_d)
            err_mu = jnp.maximum(base, comp_mu / s_d)

            converged = (err0 <= tol).astype(f32)
            subdone = err_mu <= kappa_eps * mu
            # mu**theta_mu via exp/log (mu > 0 always; plain pow may not lower)
            mu_pow = jnp.exp(theta_mu * jnp.log(mu))
            mu_new = jnp.where(
                subdone,
                jnp.maximum(tol / 10.0, jnp.minimum(kappa_mu * mu, mu_pow)),
                mu)

            # ---- barrier condensation (box rows are ±selectors) --------------
            # Qb = Hxx + diag(sigma_x rows); Rb = Huu + diag(sigma_u rows)
            Qb = [[[Hxx[k][i][j] for j in range(nx)] for i in range(nx)]
                  for k in range(N)]
            Rb = [[[Huu[k][i][j] for j in range(nu)] for i in range(nu)]
                  for k in range(N)]
            qb = [[gx[k][i] for i in range(nx)] for k in range(N)]
            rb = [[gu[k][j] for j in range(nu)] for k in range(N)]
            for k in range(N):
                for ridx, row in enumerate(rows_k[k]):
                    s_i, z_i = sv(C, k, ridx), zv(C, k, ridx)
                    sigma = z_i / s_i
                    r_in = c_all[k][ridx] + s_i
                    zh = (mu_new + z_i * r_in) / s_i
                    if row.kind == 'x':
                        Qb[k][row.idx][row.idx] = Qb[k][row.idx][row.idx] + sigma
                        qb[k][row.idx] = qb[k][row.idx] + row.sgn * zh
                    else:
                        Rb[k][row.idx][row.idx] = Rb[k][row.idx][row.idx] + sigma
                        rb[k][row.idx] = rb[k][row.idx] + row.sgn * zh
            Pt = [[HN[i][j] for j in range(nx)] for i in range(nx)]
            pt = [gN[i] for i in range(nx)]
            for ridx, row in enumerate(rows_t):
                s_i, z_i = Cv(C, o_sN + ridx), Cv(C, o_zN + ridx)
                r_in = cN_all[ridx] + s_i
                Pt[row.idx][row.idx] = Pt[row.idx][row.idx] + z_i / s_i
                pt[row.idx] = pt[row.idx] + row.sgn * (mu_new + z_i * r_in) / s_i

            rdyn = [[F[k][i] - Xv(C, k + 1, i) for i in range(nx)]
                    for k in range(N)]

            # ---- Riccati backward sweep (unrolled, same math as
            # pallas_kernels.riccati_lq_pallas) -------------------------------
            P = Pt
            p = pt
            Ks, kffs, Pn, pn = [None] * N, [None] * N, [None] * N, [None] * N
            for k in range(N - 1, -1, -1):
                Ak, Bk = A[k], Bm[k]
                ck = rdyn[k]
                Pc_p = [sum(P[i][l] * ck[l] for l in range(nx)) + p[i]
                        for i in range(nx)]
                PA = [[sum(P[i][l] * Ak[l][j] for l in range(nx))
                       for j in range(nx)] for i in range(nx)]
                PB = [[sum(P[i][l] * Bk[l][j] for l in range(nx))
                       for j in range(nu)] for i in range(nx)]
                G = [[Rb[k][i][j] + sum(Bk[l][i] * PB[l][j] for l in range(nx))
                      for j in range(nu)] for i in range(nu)]
                G = [[0.5 * (G[i][j] + G[j][i]) + (reg if i == j else 0.0)
                      for j in range(nu)] for i in range(nu)]
                Huxk = [[Hux[k][i][j] + sum(Bk[l][i] * PA[l][j]
                                            for l in range(nx))
                         for j in range(nx)] for i in range(nu)]
                g_u = [rb[k][i] + sum(Bk[l][i] * Pc_p[l] for l in range(nx))
                       for i in range(nu)]
                L = [[None] * nu for _ in range(nu)]
                for i in range(nu):
                    for j in range(i + 1):
                        acc2 = G[i][j]
                        for l in range(j):
                            acc2 = acc2 - L[i][l] * L[j][l]
                        L[i][j] = jnp.sqrt(acc2) if i == j else acc2 / L[j][j]
                rhs = [Huxk[i] + [g_u[i]] for i in range(nu)]
                ncol = nx + 1
                Yc = [[None] * ncol for _ in range(nu)]
                for i in range(nu):
                    for mcol in range(ncol):
                        acc2 = rhs[i][mcol]
                        for l in range(i):
                            acc2 = acc2 - L[i][l] * Yc[l][mcol]
                        Yc[i][mcol] = acc2 / L[i][i]
                Xc = [[None] * ncol for _ in range(nu)]
                for i in range(nu - 1, -1, -1):
                    for mcol in range(ncol):
                        acc2 = Yc[i][mcol]
                        for l in range(i + 1, nu):
                            acc2 = acc2 - L[l][i] * Xc[l][mcol]
                        Xc[i][mcol] = acc2 / L[i][i]
                Kk = [[-Xc[i][j] for j in range(nx)] for i in range(nu)]
                kffk = [-Xc[i][nx] for i in range(nu)]
                Ks[k], kffs[k], Pn[k], pn[k] = Kk, kffk, P, p
                P_new = [[Qb[k][i][j]
                          + sum(Ak[l][i] * PA[l][j] for l in range(nx))
                          + sum(Huxk[l][i] * Kk[l][j] for l in range(nu))
                          for j in range(nx)] for i in range(nx)]
                P = [[0.5 * (P_new[i][j] + P_new[j][i]) for j in range(nx)]
                     for i in range(nx)]
                p = [qb[k][i] + sum(Ak[l][i] * Pc_p[l] for l in range(nx))
                     + sum(Huxk[l][i] * kffk[l] for l in range(nu))
                     for i in range(nx)]

            # ---- forward rollout --------------------------------------------
            dX = [[jnp.zeros((PK, TB), f32) for _ in range(nx)]]   # dx0 = 0
            dU, lam_new = [], []
            for k in range(N):
                dx = dX[k]
                du = [sum(Ks[k][i][j] * dx[j] for j in range(nx)) + kffs[k][i]
                      for i in range(nu)]
                dx_n = [sum(A[k][i][j] * dx[j] for j in range(nx))
                        + sum(Bm[k][i][j] * du[j] for j in range(nu))
                        + rdyn[k][i] for i in range(nx)]
                lam_k = [sum(Pn[k][i][j] * dx_n[j] for j in range(nx)) + pn[k][i]
                         for i in range(nx)]
                dU.append(du)
                dX.append(dx_n)
                lam_new.append(lam_k)

            # ---- slack/dual directions + fraction-to-boundary ----------------
            tau = jnp.maximum(tau_min, 1.0 - mu_new)
            a_s = jnp.ones((PK, TB), f32)
            a_z = jnp.ones((PK, TB), f32)
            ds_all, dz_all = [], []
            for k in range(N):
                ds_k, dz_k = [], []
                for ridx, row in enumerate(rows_k[k]):
                    dC = row.sgn * (dU[k][row.idx] if row.kind == 'u'
                                    else dX[k][row.idx])
                    s_i, z_i = sv(C, k, ridx), zv(C, k, ridx)
                    r_in = c_all[k][ridx] + s_i
                    ds_i = -r_in - dC
                    dz_i = (mu_new - s_i * z_i - z_i * ds_i) / s_i
                    ds_k.append(ds_i)
                    dz_k.append(dz_i)
                    a_s = jnp.minimum(a_s, jnp.where(
                        ds_i < 0, -tau * s_i / jnp.minimum(ds_i, -1e-30), 1.0))
                    a_z = jnp.minimum(a_z, jnp.where(
                        dz_i < 0, -tau * z_i / jnp.minimum(dz_i, -1e-30), 1.0))
                ds_all.append(ds_k)
                dz_all.append(dz_k)
            dsN_all, dzN_all = [], []
            for ridx, row in enumerate(rows_t):
                dC = row.sgn * dX[N][row.idx]
                s_i, z_i = Cv(C, o_sN + ridx), Cv(C, o_zN + ridx)
                r_in = cN_all[ridx] + s_i
                ds_i = -r_in - dC
                dz_i = (mu_new - s_i * z_i - z_i * ds_i) / s_i
                dsN_all.append(ds_i)
                dzN_all.append(dz_i)
                a_s = jnp.minimum(a_s, jnp.where(
                    ds_i < 0, -tau * s_i / jnp.minimum(ds_i, -1e-30), 1.0))
                a_z = jnp.minimum(a_z, jnp.where(
                    dz_i < 0, -tau * z_i / jnp.minimum(dz_i, -1e-30), 1.0))
            alpha = a_s

            # ---- updates + guards --------------------------------------------
            finite = jnp.ones((PK, TB), f32)
            X_rows_new, U_rows_new = [], []
            for k in range(N + 1):
                for i in range(nx):
                    v = Xv(C, k, i) + (alpha * dX[k][i] if k > 0
                                       else jnp.zeros((PK, TB), f32))
                    X_rows_new.append(v)
                    finite = finite * jnp.isfinite(v).astype(f32)
            for k in range(N):
                for j in range(nu):
                    v = Uv(C, k, j) + alpha * dU[k][j]
                    U_rows_new.append(v)
                    finite = finite * jnp.isfinite(v).astype(f32)
            kap = 1e10
            s_rows_new, z_rows_new = [], []
            for k in range(N):
                for ridx in range(len(rows_k[k])):
                    s_i = jnp.maximum(sv(C, k, ridx) + alpha * ds_all[k][ridx],
                                      1e-30)
                    z_i = jnp.maximum(zv(C, k, ridx) + a_z * dz_all[k][ridx],
                                      1e-30)
                    z_i = jnp.clip(z_i, mu_new / (kap * s_i), kap * mu_new / s_i)
                    finite = finite * jnp.isfinite(z_i).astype(f32)
                    s_rows_new.append(s_i)
                    z_rows_new.append(z_i)
            sN_rows_new, zN_rows_new = [], []
            for ridx in range(R_t):
                s_i = jnp.maximum(Cv(C, o_sN + ridx) + alpha * dsN_all[ridx],
                                  1e-30)
                z_i = jnp.maximum(Cv(C, o_zN + ridx) + a_z * dzN_all[ridx],
                                  1e-30)
                z_i = jnp.clip(z_i, mu_new / (kap * s_i), kap * mu_new / s_i)
                finite = finite * jnp.isfinite(z_i).astype(f32)
                sN_rows_new.append(s_i)
                zN_rows_new.append(z_i)
            bad = 1.0 - finite

            # keep current point when converged or the step went non-finite;
            # frozen lanes (done in an earlier iteration) keep everything
            keep = jnp.maximum(converged, bad)
            upd = (1.0 - frozen.astype(f32)) * (1.0 - keep)

            def mix(old, new):
                return old + upd * (new - old)

            out_rows = []
            r = 0
            for k in range(N + 1):
                for i in range(nx):
                    out_rows.append(mix(Xv(C, k, i), X_rows_new[r]))
                    r += 1
            r = 0
            for k in range(N):
                for j in range(nu):
                    out_rows.append(mix(Uv(C, k, j), U_rows_new[r]))
                    r += 1
            for k in range(N):
                for i in range(nx):
                    out_rows.append(mix(lamv(C, k, i), lam_new[k][i]))
            r = 0
            for k in range(N):
                for ridx in range(len(rows_k[k])):
                    out_rows.append(mix(sv(C, k, ridx), s_rows_new[r]))
                    r += 1
            r = 0
            for k in range(N):
                for ridx in range(len(rows_k[k])):
                    out_rows.append(mix(zv(C, k, ridx), z_rows_new[r]))
                    r += 1
            for ridx in range(R_t):
                out_rows.append(mix(Cv(C, o_sN + ridx), sN_rows_new[ridx]))
            for ridx in range(R_t):
                out_rows.append(mix(Cv(C, o_zN + ridx), zN_rows_new[ridx]))
            nf = 1.0 - frozen.astype(f32)
            out_rows.append(Cv(C, o_mu) + nf * (mu_new - Cv(C, o_mu)))
            out_rows.append(Cv(C, o_kkt) + nf * (err0 - Cv(C, o_kkt)))
            out_rows.append(Cv(C, o_it) + nf)
            out_rows.append(Cv(C, o_conv) + nf * (converged - Cv(C, o_conv)))
            div_new = jnp.maximum(Cv(C, o_div), nf * bad)
            out_rows.append(div_new)
            return jnp.concatenate(out_rows, axis=0)

        def cond(C):
            active = ((Cv(C, o_conv) < 0.5) & (Cv(C, o_div) < 0.5)
                      & (Cv(C, o_it) < max_iter - 0.5))
            return jnp.any(active)

        C = jax.lax.while_loop(cond, body, C)

        # ---- objective at the final point + outputs --------------------------
        obj = jnp.zeros((PK, TB), f32)
        for k in range(N):
            xk = Cvec(C, o_X + k * nx, nx)
            uk = Cvec(C, o_U + k * nu, nu)
            obj = obj + cost_val_v(xk, uk, thv(k))
        xN = Cvec(C, o_X + N * nx, nx)
        obj = obj + term_val_v(xN, thv(N))

        ones = jnp.ones((PK, TB), f32)
        for k in range(N + 1):
            for i in range(nx):
                X_out[k, i * PK:(i + 1) * PK, :] = Xv(C, k, i)
        for k in range(N):
            for j in range(nu):
                U_out[k, j * PK:(j + 1) * PK, :] = Uv(C, k, j)
            for i in range(nx):
                lam_out[k, i * PK:(i + 1) * PK, :] = lamv(C, k, i)
        for r in range(max(R_s, 1)):
            s_out[r * PK:(r + 1) * PK, :] = Cv(C, o_s + r) if R_s else ones
            z_out[r * PK:(r + 1) * PK, :] = Cv(C, o_z + r) if R_s else ones
        rt = max(R_t, 1)
        for r in range(rt):
            sNzN_out[r * PK:(r + 1) * PK, :] = (Cv(C, o_sN + r) if R_t
                                              else ones)
            sNzN_out[(rt + r) * PK:(rt + r + 1) * PK, :] = (
                Cv(C, o_zN + r) if R_t else ones)
        misc_out[0 * PK:1 * PK, :] = Cv(C, o_mu)
        misc_out[1 * PK:2 * PK, :] = Cv(C, o_kkt)
        misc_out[2 * PK:3 * PK, :] = obj
        misc_out[3 * PK:4 * PK, :] = Cv(C, o_it)
        misc_out[4 * PK:5 * PK, :] = Cv(C, o_conv)
        misc_out[5 * PK:6 * PK, :] = Cv(C, o_div)

    # ---- host-side packing ---------------------------------------------------
    # scenario b = t*P*TB + s*TB + l lands at [row i*P+s, col t*TB+l]: each
    # per-scenario scalar fills whole (PK, TB) sublane tiles (cf.
    # pallas_kernels.riccati_lq_pallas to_feat)
    def to_feat(x, n_lead, nfeat):
        x = jnp.asarray(x, f32).reshape(B, n_lead, nfeat)
        x = jnp.pad(x, ((0, Bpad - B), (0, 0), (0, 0)))
        x = x.reshape(ntiles, PK, TB, n_lead, nfeat)
        return x.transpose(3, 4, 1, 0, 2).reshape(n_lead, nfeat * PK, lanes)

    def from_feat(y, n_lead, nfeat):
        y = y.reshape(n_lead, nfeat, PK, ntiles, TB)
        y = y.transpose(3, 2, 4, 0, 1).reshape(Bpad, n_lead, nfeat)
        return y[:B]

    X_B = jnp.asarray(X_B, f32).at[:, 0, :].set(jnp.asarray(x0_B, f32))
    th_f = to_feat(theta_B, N + 1, nt)
    X_f = to_feat(X_B, N + 1, nx)
    U_f = to_feat(U_B, N, nu)
    valid = to_feat((jnp.arange(Bpad) < B).astype(f32)[:B],
                    1, 1)[0]                         # (P, lanes)

    grid = (ntiles,)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def spec3(n_lead, nfeat):
        return pl.BlockSpec((n_lead, nfeat * PK, TB), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((N + 1, nx * PK, lanes), f32),
        jax.ShapeDtypeStruct((N, nu * PK, lanes), f32),
        jax.ShapeDtypeStruct((N, nx * PK, lanes), f32),
        jax.ShapeDtypeStruct((max(R_s, 1) * PK, lanes), f32),
        jax.ShapeDtypeStruct((max(R_s, 1) * PK, lanes), f32),
        jax.ShapeDtypeStruct((2 * max(R_t, 1) * PK, lanes), f32),
        jax.ShapeDtypeStruct((6 * PK, lanes), f32),
    )

    def spec2(nr):
        return pl.BlockSpec((nr * PK, TB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    call_kwargs = {}
    if not interpret and vmem_mb is not None:
        # packed layouts (pack>=4) need more scoped VMEM than the 16 MB
        # default for their flattened-lane AD stack (measured: N=2 pack=8
        # wants 25.9 MB, N=8 pack=4 17.8 MB). CAUTION: a 100 MB request made
        # kernels fault at runtime inside large-batch solves in round 3 —
        # validate any raised limit against the XLA path at production batch.
        call_kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb * 2 ** 20))
    X_o, U_o, lam_o, s_o, z_o, sNzN_o, misc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec2(1), spec3(N + 1, nt), spec3(N + 1, nx), spec3(N, nu)],
        out_specs=(spec3(N + 1, nx), spec3(N, nu), spec3(N, nx),
                   spec2(max(R_s, 1)), spec2(max(R_s, 1)),
                   spec2(2 * max(R_t, 1)), spec2(6)),
        out_shape=out_shape,
        interpret=interpret,
        **call_kwargs,
    )(valid, th_f, X_f, U_f)

    def back(x, shape, n_lead, nfeat):
        return from_feat(x, n_lead, nfeat).reshape(shape)

    def back2(x, nr):
        # (nr*P, lanes) -> (B, nr)
        return from_feat(x.reshape(1, nr * PK, lanes), 1, nr)[:, 0, :]

    X = back(X_o, (B, N + 1, nx), N + 1, nx)
    U = back(U_o, (B, N, nu), N, nu)
    lam = back(lam_o, (B, N, nx), N, nx)
    # scatter active rows back into the full (N, m) layout; masked rows are 1.0
    # (the XLA path pins them to 1.0 each iteration)
    s_full = jnp.ones((B, N, m_full), f32)
    z_full = jnp.ones((B, N, m_full), f32)
    if R_s:
        k_idx = np.concatenate([np.full(len(rows_k[k]), k, np.int32)
                                for k in range(N)])
        c_idx = np.concatenate([np.array([r.full_col for r in rows_k[k]],
                                         np.int32) for k in range(N)])
        s_rows = back2(s_o, max(R_s, 1))[:, :R_s]   # (B, R_s)
        z_rows = back2(z_o, max(R_s, 1))[:, :R_s]
        s_full = s_full.at[:, k_idx, c_idx].set(s_rows)
        z_full = z_full.at[:, k_idx, c_idx].set(z_rows)
    sN_full = jnp.ones((B, mN_full), f32)
    zN_full = jnp.ones((B, mN_full), f32)
    if R_t:
        cN_idx = np.array([r.full_col for r in rows_t], np.int32)
        rt = max(R_t, 1)
        sNzN_b = back2(sNzN_o, 2 * rt)
        sN_rows = sNzN_b[:, :R_t]
        zN_rows = sNzN_b[:, rt:rt + R_t]
        sN_full = sN_full.at[:, cN_idx].set(sN_rows)
        zN_full = zN_full.at[:, cN_idx].set(zN_rows)
    misc_b = back2(misc, 6)                          # (B, 6)
    conv = misc_b[:, 4] > 0.5
    div = misc_b[:, 5] > 0.5
    status = jnp.where(conv, 0, jnp.where(div, 2, 1)).astype(jnp.int32)
    return OCPSolution(
        X=X, U=U, lam=lam, s=s_full, z=z_full, sN=sN_full, zN=zN_full,
        mu=misc_b[:, 0], kkt_error=misc_b[:, 1], objective=misc_b[:, 2],
        iterations=misc_b[:, 3].astype(jnp.int32), converged=conv,
        status=status)
