"""Micro-bench: tiny batched linalg inside a sequential scan on TPU.

Isolates what makes the Riccati sweep expensive: 40 dependent steps of
(B, n, n) ops — generic cholesky/cho_solve vs closed-form small solves.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    B, n, steps = 4096, 2, 40
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (B, n, n)) * 0.1
    A = jnp.eye(n) + 0.1 * M
    P0 = jnp.tile(jnp.eye(n), (B, 1, 1))

    with jax.default_matmul_precision("highest"):

        @jax.jit
        def scan_matmul(P):
            def body(P, _):
                P = jnp.einsum("bij,bjk,blk->bil", A, P, A) + 0.01 * jnp.eye(n)
                return P, ()
            P, _ = lax.scan(body, P, None, length=steps)
            return P

        @jax.jit
        def scan_chol(P):
            def body(P, _):
                G = P + 0.1 * jnp.eye(n)
                L = jnp.linalg.cholesky(G)
                K = jax.scipy.linalg.cho_solve((L, True), A)
                P = jnp.einsum("bij,bjk->bik", K, P) + 0.01 * jnp.eye(n)
                P = 0.5 * (P + jnp.swapaxes(P, 1, 2)) + jnp.eye(n)
                return P, ()
            P, _ = lax.scan(body, P, None, length=steps)
            return P

        def solve2x2(G, Rhs):
            # closed-form 2x2 solve, batched: G (B,2,2), Rhs (B,2,k)
            a, b = G[:, 0, 0], G[:, 0, 1]
            c, d = G[:, 1, 0], G[:, 1, 1]
            det = a * d - b * c
            inv = jnp.stack([jnp.stack([d, -b], -1),
                             jnp.stack([-c, a], -1)], -2) / det[:, None, None]
            return inv @ Rhs

        @jax.jit
        def scan_closed(P):
            def body(P, _):
                G = P + 0.1 * jnp.eye(n)
                K = solve2x2(G, A)
                P = jnp.einsum("bij,bjk->bik", K, P) + 0.01 * jnp.eye(n)
                P = 0.5 * (P + jnp.swapaxes(P, 1, 2)) + jnp.eye(n)
                return P, ()
            P, _ = lax.scan(body, P, None, length=steps)
            return P

        @jax.jit
        def scan_chol_unroll(P):
            def body(P, _):
                G = P + 0.1 * jnp.eye(n)
                L = jnp.linalg.cholesky(G)
                K = jax.scipy.linalg.cho_solve((L, True), A)
                P = jnp.einsum("bij,bjk->bik", K, P) + 0.01 * jnp.eye(n)
                P = 0.5 * (P + jnp.swapaxes(P, 1, 2)) + jnp.eye(n)
                return P, ()
            P, _ = lax.scan(body, P, None, length=steps, unroll=steps)
            return P

        @jax.jit
        def scan_closed_unroll(P):
            def body(P, _):
                G = P + 0.1 * jnp.eye(n)
                K = solve2x2(G, A)
                P = jnp.einsum("bij,bjk->bik", K, P) + 0.01 * jnp.eye(n)
                P = 0.5 * (P + jnp.swapaxes(P, 1, 2)) + jnp.eye(n)
                return P, ()
            P, _ = lax.scan(body, P, None, length=steps, unroll=steps)
            return P

        for name, fn in [("matmul-only scan", scan_matmul),
                         ("cholesky scan", scan_chol),
                         ("closed-form 2x2 scan", scan_closed),
                         ("cholesky scan unroll", scan_chol_unroll),
                         ("closed 2x2 scan unroll", scan_closed_unroll)]:
            t = timeit(fn, P0)
            print(f"{name:24s} {t*1e3:8.3f} ms  ({t/steps*1e6:7.1f} us/step)",
                  flush=True)


if __name__ == "__main__":
    main()
