"""Roofline / MFU accounting for the flagship batched NMPC solve.

Answers VERDICT r2 weak #2: how fast is the flagship path vs the SILICON, not
just vs the reference baseline — counts FLOPs and minimum HBM bytes per solve,
measures achieved FLOP/s and bandwidth on the chip, and names the binding
resource behind the flat B-curve (BENCH_SWEEP.md).

Also A/B-measures the Pallas Riccati sweep's two layouts:
  pack=1  — each per-stage feature is a (1, tile_b) lane stripe: every VPU op
            uses 1 of 8 sublane rows of its VREGs (<=12.5% lane utilization)
  pack=8  — features fill whole (8, tile_b) sublane tiles (full VREGs)

Usage:  python tools/roofline.py [B] [--json out.json]
Runs on whatever backend jax resolves (the real chip under the driver; CPU
interpret-mode numbers are meaningless for the roofline itself).

Workload model (why MXU MFU is the wrong lens here): the CSTR OCP has
nx=2, nu=1 — every per-scenario operation is scalar algebra batched over
scenarios, i.e. ELEMENTWISE across the batch. There are no >=128-wide
contractions, so the MXU (128x128 systolic array) cannot be engaged by any
layout of this problem; the per-chip ceiling is set by VPU issue rate and
HBM/VMEM bandwidth. We therefore report:
  - MFU vs MXU bf16 peak (the honest "vs the datasheet" number),
  - utilization vs the VPU f32 ceiling (the relevant compute roof),
  - achieved HBM bandwidth vs peak (the relevant memory roof).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

# per-chip peaks by device_kind (public datasheet numbers; VPU is an estimate:
# 8 sublanes x 128 lanes x 4 ALUs x 2 FLOPs/FMA x clock — treat as +/-2x)
PEAKS = {
    "v5e": {"mxu_bf16": 197e12, "hbm_Bps": 819e9, "vpu_f32": 12e12,
            "clock_hz": 1.5e9},
    "v5p": {"mxu_bf16": 459e12, "hbm_Bps": 2765e9, "vpu_f32": 14e12,
            "clock_hz": 1.75e9},
    "v4": {"mxu_bf16": 275e12, "hbm_Bps": 1228e9, "vpu_f32": 9e12,
           "clock_hz": 1.05e9},
    "v6e": {"mxu_bf16": 918e12, "hbm_Bps": 1640e9, "vpu_f32": 15e12,
            "clock_hz": 1.7e9},
}


def _peaks_for(device) -> dict:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in PEAKS.items():
        if key in kind:
            return {"device_kind": kind, **val}
    return {"device_kind": kind or "unknown", **PEAKS["v5e"]}


# ---------------------------------------------------------------------------
# analytic FLOP / byte counts
# ---------------------------------------------------------------------------


class _Ctr:
    """Scalar stand-in that counts flops flowing through the Riccati algebra.

    Mirrors ops/pallas_kernels.py:riccati_lq_pallas stage-for-stage (each
    arithmetic op there is one batched VPU op; here it is one counter tick).
    """

    ops = 0

    def _t(self, n=1):
        _Ctr.ops += n
        return self

    def __add__(self, o): return self._t()
    __radd__ = __add__
    def __sub__(self, o): return self._t()
    __rsub__ = __sub__
    def __mul__(self, o): return self._t()
    __rmul__ = __mul__
    def __truediv__(self, o): return self._t()
    __rtruediv__ = __truediv__
    def __neg__(self): return self._t()
    def sqrt(self): return self._t()


def lq_sweep_flops(N: int, nx: int, nu: int) -> int:
    """Exact per-scenario FLOPs of one fused backward+forward LQ sweep,
    counted by running the kernel's own loop structure on counting scalars."""
    _Ctr.ops = 0
    c = lambda: _Ctr()
    sqrt = lambda v: v.sqrt()
    P = [[c() for _ in range(nx)] for _ in range(nx)]
    p = [c() for _ in range(nx)]
    dec = c()
    for _k in range(N):
        Ak = [[c() for _ in range(nx)] for _ in range(nx)]
        Bk = [[c() for _ in range(nu)] for _ in range(nx)]
        ck = [c() for _ in range(nx)]
        Pc_p = [sum((P[i][l] * ck[l] for l in range(nx)), c()) + p[i]
                for i in range(nx)]
        PA = [[sum((P[i][l] * Ak[l][j] for l in range(nx)), c())
               for j in range(nx)] for i in range(nx)]
        PB = [[sum((P[i][l] * Bk[l][j] for l in range(nx)), c())
               for j in range(nu)] for i in range(nx)]
        G = [[c() + sum((Bk[l][i] * PB[l][j] for l in range(nx)), c())
              for j in range(nu)] for i in range(nu)]
        G = [[(G[i][j] + G[j][i]) * 0.5 + (0.0 if i != j else 1e-8)
              for j in range(nu)] for i in range(nu)]
        Hux = [[c() + sum((Bk[l][i] * PA[l][j] for l in range(nx)), c())
                for j in range(nx)] for i in range(nu)]
        g_u = [c() + sum((Bk[l][i] * Pc_p[l] for l in range(nx)), c())
               for i in range(nu)]
        L = [[None] * nu for _ in range(nu)]
        for i in range(nu):
            for j in range(i + 1):
                s_ = G[i][j]
                for l in range(j):
                    s_ = s_ - L[i][l] * L[j][l]
                L[i][j] = sqrt(s_) if i == j else s_ / L[j][j]
        rhs = [Hux[i] + [g_u[i]] for i in range(nu)]
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
        P_new = [[c() + sum((Ak[l][i] * PA[l][j] for l in range(nx)), c())
                  + sum((Hux[l][i] * Kk[l][j] for l in range(nu)), c())
                  for j in range(nx)] for i in range(nx)]
        P = [[(P_new[i][j] + P_new[j][i]) * 0.5 for j in range(nx)]
             for i in range(nx)]
        p = [c() + sum((Ak[l][i] * Pc_p[l] for l in range(nx)), c())
             + sum((Hux[l][i] * kffk[l] for l in range(nu)), c())
             for i in range(nx)]
        dec = dec - sum((kffk[i] * g_u[i] for i in range(nu)), c()) * 0.5
    # forward rollout
    dx = [c() for _ in range(nx)]
    for _k in range(N):
        Kk = [[c() for _ in range(nx)] for _ in range(nu)]
        du = [sum((Kk[i][j] * dx[j] for j in range(nx)), c()) + c()
              for i in range(nu)]
        dx_n = [sum((c() * dx[j] for j in range(nx)), c())
                + sum((c() * du[j] for j in range(nu)), c()) + c()
                for i in range(nx)]
        _ = [sum((c() * dx_n[j] for j in range(nx)), c()) + c()
             for i in range(nx)]
        dx = dx_n
    return _Ctr.ops


def lq_sweep_bytes(N: int, nx: int, nu: int, itemsize: int = 4) -> int:
    """Minimum HBM traffic per scenario for one fused sweep: each input read
    once, each output written once (the kernel keeps everything else in VMEM).
    """
    inputs = N * (2 * nx * nx + 2 * nx * nu + nu * nu + 2 * nx + nu) \
        + nx * nx + 2 * nx
    outputs = (N + 1) * nx + N * (2 * nu + nx + nu * nx) + 1
    return (inputs + outputs) * itemsize


# ---------------------------------------------------------------------------
# measurements
# ---------------------------------------------------------------------------


def _timeit(fn, args, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def measure_kernel_ab(B: int, N=20, nx=2, nu=1, reps=4, K=20):
    """Time one fused Riccati sweep in both layouts at flagship-like shapes.

    A single kernel launch is far below the remote-dispatch floor (~27 ms
    through the axon tunnel), so the kernel is looped K times inside one jit
    (inputs perturbed per iteration so nothing is CSE'd) and the per-kernel
    time is the (K-loop − 1-call) difference over K−1."""
    import jax
    import jax.numpy as jnp

    from hilo_mpc_tpu.ops.pallas_kernels import riccati_lq_pallas

    rng = np.random.default_rng(0)
    args = (np.eye(nx) + 0.05 * rng.standard_normal((B, N, nx, nx)),
            0.3 * rng.standard_normal((B, N, nx, nu)),
            np.tile(np.eye(nx), (B, N, 1, 1)),
            0.1 * rng.standard_normal((B, N, nu, nx)),
            np.tile(0.5 * np.eye(nu), (B, N, 1, 1)),
            rng.standard_normal((B, N, nx)),
            rng.standard_normal((B, N, nu)),
            0.1 * rng.standard_normal((B, N, nx)),
            np.tile(np.eye(nx), (B, 1, 1)),
            rng.standard_normal((B, nx)),
            rng.standard_normal((B, nx)))
    args = tuple(jnp.asarray(a, jnp.float32) for a in args)
    res = {}
    for pack in (1, 8):
        @jax.jit
        def fnK(*a, _p=pack):
            def body(i, acc):
                out = riccati_lq_pallas(*a[:-1], a[-1] + acc * 1e-9, pack=_p)
                return acc + jnp.sum(out[1])
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        @jax.jit
        def fn1(*a, _p=pack):
            return jnp.sum(riccati_lq_pallas(*a, pack=_p)[1])

        float(fnK(*args)), float(fn1(*args))   # compile
        tsK, ts1 = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fnK(*args))
            tsK.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(fn1(*args))
            ts1.append(time.perf_counter() - t0)
        t = max((min(tsK) - min(ts1)) / (K - 1), 1e-9)
        res[f"pack{pack}_s"] = t
        res[f"pack{pack}_sweeps_per_s"] = B / t
    res["speedup_pack8"] = res["pack1_s"] / res["pack8_s"]
    flops = lq_sweep_flops(N, nx, nu)
    bts = lq_sweep_bytes(N, nx, nu)
    res.update(
        sweep_flops_per_scenario=flops,
        sweep_min_bytes_per_scenario=bts,
        pack1_gflops=B * flops / res["pack1_s"] / 1e9,
        pack8_gflops=B * flops / res["pack8_s"] / 1e9,
        pack1_GBps=B * bts / res["pack1_s"] / 1e9,
        pack8_GBps=B * bts / res["pack8_s"] / 1e9,
        arithmetic_intensity=flops / bts,
    )
    return res


def measure_flagship(B: int, reps=3, pallas=True, pack=8):
    """Flagship batched solve: wall time + XLA-reported flops/bytes."""
    import jax

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    nmpc = ge._build_nmpc(N=20, tol=1e-4, max_iter=25)
    if not pallas:
        import dataclasses
        nmpc._ip_opts = dataclasses.replace(nmpc._ip_opts,
                                            pallas_riccati=False)
    args = ge._batch_inputs(nmpc, B)
    fn = nmpc.solve_batch_fn()
    t0 = time.time()
    sol = fn(*args)
    jax.block_until_ready(sol.U)
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sol = fn(*args)
        jax.block_until_ready(sol.U)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    iters = np.asarray(sol.iterations)
    out = {"B": B, "t_s": t, "solves_per_s": B / t,
           "compile_s": compile_s,
           "iters_p50": float(np.median(iters)),
           "iters_max": float(iters.max()),
           "converged": float(np.asarray(sol.converged).mean())}
    return out


def xla_cost_analysis(B: int = 4096):
    """XLA's own flops/bytes estimate for the flagship solve (body of the IP
    while-loop is counted ONCE — multiply by the measured trip count)."""
    import jax

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    import dataclasses

    nmpc = ge._build_nmpc(N=20, tol=1e-4, max_iter=25)
    # XLA path so the cost analysis sees the sweeps too (the Pallas kernel is
    # an opaque custom call with no cost model)
    nmpc._ip_opts = dataclasses.replace(nmpc._ip_opts, pallas_riccati=False)
    args = ge._batch_inputs(nmpc, B)
    fn = nmpc.solve_batch_fn()
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops_per_solve_one_trip": float(ca.get("flops", 0)) / B,
                "bytes_per_solve_one_trip":
                    float(ca.get("bytes accessed", 0)) / B}
    except Exception as e:  # cost analysis unavailable on some backends
        return {"error": f"{type(e).__name__}: {e}"}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/hilo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    dev = jax.devices()[0]
    peaks = _peaks_for(dev)
    print(f"# device={dev.platform}:{peaks['device_kind']} B={B}",
          file=sys.stderr)

    report = {"B": B, "device": peaks}

    print("# flagship solve (pallas pack=8) ...", file=sys.stderr)
    report["flagship"] = measure_flagship(B)
    print(f"#   {report['flagship']['solves_per_s']:.0f} solves/s",
          file=sys.stderr)

    print("# kernel A/B pack=1 vs pack=8 ...", file=sys.stderr)
    report["kernel_ab"] = measure_kernel_ab(B)
    print(f"#   pack1 {report['kernel_ab']['pack1_s']*1e3:.2f} ms, "
          f"pack8 {report['kernel_ab']['pack8_s']*1e3:.2f} ms "
          f"({report['kernel_ab']['speedup_pack8']:.2f}x)", file=sys.stderr)

    print("# XLA cost analysis ...", file=sys.stderr)
    report["xla_cost"] = xla_cost_analysis()

    # ---- roofline synthesis ----
    fl = report["flagship"]
    ka = report["kernel_ab"]
    xc = report["xla_cost"]
    trips = fl["iters_max"]  # while-loop under vmap runs until ALL lanes done
    syn = {}
    if "flops_per_solve_one_trip" in xc:
        # total executed flops/solve ~= one-trip count scaled by trip count
        # (the body dominates; outside-loop work is included in the one-trip
        # number so this slightly overestimates — upper bound on utilization)
        flops_solve = xc["flops_per_solve_one_trip"] * trips
        bytes_solve = xc["bytes_per_solve_one_trip"] * trips
        achieved = flops_solve * fl["solves_per_s"]
        bw = bytes_solve * fl["solves_per_s"]
        syn = {
            "flops_per_solve": flops_solve,
            "bytes_per_solve_xla_est": bytes_solve,
            "achieved_flops": achieved,
            "achieved_GBps_xla_est": bw / 1e9,
            "mfu_vs_mxu_bf16": achieved / peaks["mxu_bf16"],
            "util_vs_vpu_f32_est": achieved / peaks["vpu_f32"],
            "hbm_util_est": bw / peaks["hbm_Bps"],
        }
    syn["kernel_ai_flops_per_byte"] = ka["arithmetic_intensity"]
    syn["kernel_ridge_ai_vpu"] = peaks["vpu_f32"] / peaks["hbm_Bps"]
    # binding resource: compare achieved fractions
    if syn.get("hbm_util_est", 0) > 0.6:
        syn["binding_resource"] = "HBM bandwidth"
    elif syn.get("util_vs_vpu_f32_est", 0) > 0.3:
        syn["binding_resource"] = "VPU issue rate"
    else:
        syn["binding_resource"] = (
            "VPU issue rate / op serialization (low measured HBM util, "
            "no MXU-shaped work in the problem)")
    report["roofline"] = syn

    out = "ROOFLINE.json"
    for i, a in enumerate(sys.argv):
        if a == "--json" and i + 1 < len(sys.argv):
            out = sys.argv[i + 1]
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
