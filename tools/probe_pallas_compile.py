"""Mosaic compile-time probe for the whole-IP Pallas kernel (VERDICT r3 #2).

The pack=8 whole-solve kernel's Mosaic compile is pathological at the
flagship shape (N=20: >75 min at tile 128, killed). This probe measures the
compile-time SCALING in the horizon N at both packings so the pathology can
be pinned (linear vs exponential growth, and whether any useful N compiles
in bounded time). Run one (N, pack, tile) compile per process so a hung
compile can be killed from outside:

    for N in 2 4 6 8; do timeout 900 python tools/probe_pallas_compile.py $N 8 128; done

Prints one line: `N=<n> pack=<p> tile=<t> compile_s=<seconds>` (or the
process is killed by the timeout — record that as >timeout).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pack = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    vmem_mb = float(sys.argv[4]) if len(sys.argv) > 4 else None
    B = pack * tile

    import jax

    # intentionally NOT using the persistent cache: we are timing the compile
    import __graft_entry__ as ge

    nmpc = ge._build_nmpc(N=N, max_iter=8, convexify=False,
                          mehrotra=False, n_linesearch=1)
    args = ge._batch_inputs(nmpc, B)

    from hilo_mpc_tpu.ops.pallas_ip import (pallas_full_supported,
                                            solve_ocp_pallas_full)

    assert pallas_full_supported(nmpc._dims, nmpc._bounds, nmpc._ip_opts,
                                 fix_x0=True)
    funcs, dims, bounds = nmpc._funcs, nmpc._dims, nmpc._bounds
    opts = nmpc._ip_opts

    def solve(theta_B, xs0_B, X_B, U_B):
        return solve_ocp_pallas_full(funcs, dims, bounds, theta_B, xs0_B,
                                     X_B, U_B, options=opts, tile_b=tile,
                                     interpret=False, pack=pack,
                                     vmem_mb=vmem_mb)

    t0 = time.time()
    sol = jax.jit(solve)(*args)
    jax.block_until_ready(sol.U)
    dt = time.time() - t0
    conv = float(np.asarray(sol.converged).mean())
    print(f"N={N} pack={pack} tile={tile} vmem={vmem_mb} compile_s={dt:.1f} "
          f"converged={conv:.3f}", flush=True)


if __name__ == "__main__":
    main()
