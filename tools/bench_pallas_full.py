"""Measure the whole-solve Pallas IP kernel (ops/pallas_ip.py) on the real chip
against the flagship XLA path at the bench config (CSTR, N=20).

Usage: python tools/bench_pallas_full.py [B] [reps] [tile_b] [pack] [vmem_mb]
(pack>=4 needs a raised vmem_mb — see probe_pallas_compile.py measurements)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hilo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import __graft_entry__ as ge

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    # -- XLA flagship path --------------------------------------------------
    nmpc = ge._build_nmpc(N=20, tol=1e-4, max_iter=25)
    args = ge._batch_inputs(nmpc, B)
    fn = nmpc.solve_batch_fn()
    t0 = time.time()
    sol = fn(*args)
    jax.block_until_ready(sol.U)
    print(f"xla     compile {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sol = fn(*args)
        jax.block_until_ready(sol.U)
        times.append(time.perf_counter() - t0)
    t_xla = min(times)
    conv = float(np.asarray(sol.converged).mean())
    print(f"xla     B={B} t={t_xla*1e3:.2f}ms {B/t_xla/1e3:.0f}k solves/s "
          f"conv={conv:.3f} iters_p50={np.median(np.asarray(sol.iterations))}")
    U_ref = np.asarray(sol.U)

    # -- whole-solve Pallas kernel -------------------------------------------
    from hilo_mpc_tpu.ops.pallas_ip import (pallas_full_supported,
                                            solve_ocp_pallas_full)
    assert pallas_full_supported(nmpc._dims, nmpc._bounds, nmpc._ip_opts, True)
    opts = nmpc._ip_opts
    theta_B, xs0_B, X_B, U_B = args

    tile_b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    pack = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    vmem_mb = float(sys.argv[5]) if len(sys.argv) > 5 else None
    pl = jax.jit(lambda th, x0, X, U: solve_ocp_pallas_full(
        nmpc._funcs, nmpc._dims, nmpc._bounds, th, x0, X, U,
        options=opts, tile_b=tile_b, pack=pack, vmem_mb=vmem_mb))
    t0 = time.time()
    solp = pl(theta_B, xs0_B, X_B, U_B)
    jax.block_until_ready(solp.U)
    print(f"pallas  compile {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        solp = pl(theta_B, xs0_B, X_B, U_B)
        jax.block_until_ready(solp.U)
        times.append(time.perf_counter() - t0)
    t_pl = min(times)
    convp = float(np.asarray(solp.converged).mean())
    du = float(np.abs(np.asarray(solp.U) - U_ref).max())
    print(f"pallas  B={B} t={t_pl*1e3:.2f}ms {B/t_pl/1e3:.0f}k solves/s "
          f"conv={convp:.3f} iters_p50={np.median(np.asarray(solp.iterations))} "
          f"max|dU|={du:.2e} speedup={t_xla/t_pl:.2f}x")


if __name__ == "__main__":
    main()
