"""Secondary throughput benchmarks on the real chip: estimators, MHE, GP, ANN.

Complements bench.py's headline NMPC metric with the other hot paths; prints a
small table. Run on the TPU dev tunnel: `python tools/bench_secondary.py`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=3):
    import jax
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def cstr():
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz
    m = cstr_schaffner_and_zeitz()
    return m


def bench_filters():
    """Batched EKF/UKF/PF: B parallel filters x T steps in one dispatch."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hilo_mpc_tpu import EKF, PF, UKF

    B, T = 8192, 100
    p = jnp.asarray([1.0] * 6, jnp.float32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.25 + 0.02 * rng.standard_normal((B, 2)), jnp.float32)
    ys = jnp.asarray(0.25 + 0.01 * rng.standard_normal((B, T, 1)), jnp.float32)
    us = jnp.zeros((B, T, 1), jnp.float32)
    rows = []
    for name, cls in [("EKF", EKF), ("UKF", UKF)]:
        est = cls(cstr())
        est.setup(dt=0.1)
        est.Q = 1e-4 * np.eye(2)
        est.R = 1e-3 * np.eye(1)
        step = est.step_fn()  # (x, P, u, p, y, t) -> (x, P, y_pred)

        @jax.jit
        def run(x0, ys, us, _step=step):
            P0 = 0.01 * jnp.eye(2, dtype=jnp.float32)

            def one(x0_i, ys_i, us_i):
                def body(carry, inp):
                    x, P, t = carry
                    y, u = inp
                    x, P, yp = _step(x, P, u, p, y, t)
                    return (x, P, t + 0.1), x
                (_, _, _), xs = lax.scan(body, (x0_i, P0, 0.0), (ys_i, us_i))
                return xs

            return jax.vmap(one)(x0, ys, us)

        t = timeit(lambda: run(x0, ys, us))
        rows.append((name, B * T / t, t))
    # particle filter: fewer parallel instances, many particles each
    pf = PF(cstr(), n_particles=1024)
    pf.Q = 1e-4 * np.eye(2)
    pf.R = 1e-3 * np.eye(1)
    pf.setup(dt=0.1)
    Bp = 256
    x0p = jnp.asarray(0.25 + 0.02 * rng.standard_normal((Bp, 2)), jnp.float32)
    ysp = jnp.asarray(0.25 + 0.01 * rng.standard_normal((Bp, T, 1)), jnp.float32)
    usp = jnp.zeros((Bp, T, 1), jnp.float32)
    stepf = pf.step_fn()

    @jax.jit
    def run_pf(x0, ys, us):
        import jax.random as jr

        def one(x0_i, ys_i, us_i, key):
            parts = x0_i[None, :] + 0.01 * jr.normal(key, (1024, 2))

            def body(carry, inp):
                parts, t, key = carry
                y, u = inp
                key, parts, x_est, y_est = stepf(key, parts, u, p, y, t)
                return (parts, t + 0.1, key), x_est
            (_, _, _), xs = lax.scan(body, (parts, 0.0, key), (ys_i, us_i))
            return xs
        keys = jr.split(jr.PRNGKey(0), Bp)
        return jax.vmap(one)(x0, ys, us, keys)

    try:
        t = timeit(lambda: run_pf(x0p, ysp, usp))
        rows.append(("PF(1024 particles)", Bp * T / t, t))
    except Exception as e:
        print(f"  PF bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    return rows


def bench_mhe():
    import jax
    import jax.numpy as jnp

    from hilo_mpc_tpu import MHE

    mhe = MHE(cstr())
    mhe.horizon = 10
    mhe.Q = 1e-4
    mhe.R = 1e-3
    mhe.P0 = np.eye(2) * 0.1
    mhe.set_initial_parameter_values([1.0] * 6)
    mhe.setup(dt=0.1)
    mhe.set_initial_guess([0.25, 0.15])
    B = 4096
    rng = np.random.default_rng(1)
    ys = 0.25 + 0.01 * rng.standard_normal((B, 11, 1))
    us = np.zeros((B, 11, 1))
    x_arr = np.tile([0.25, 0.15], (B, 1))
    x_est, sol = mhe.estimate_batch(ys, us, x_arrivals=x_arr)  # compile
    t = timeit(lambda: mhe.estimate_batch(ys, us, x_arrivals=x_arr)[1].X)
    conv = float(np.asarray(sol.converged).mean())
    return [("MHE(N=10 window)", B / t, t)], conv


def bench_gp():
    import jax
    import jax.numpy as jnp

    from hilo_mpc_tpu import GP

    rng = np.random.default_rng(2)
    X = rng.uniform(-3, 3, (256, 1))
    y = np.sin(X[:, 0]) + 0.05 * rng.standard_normal(256)
    gp = GP(["x"], ["y"])
    gp.set_training_data(X.T, y[None])
    gp.setup()
    t0 = time.time()
    gp.fit_model(solver="adam", max_iter=300)
    t_fit = time.time() - t0
    Xq = jnp.asarray(rng.uniform(-3, 3, (1, 100000)), jnp.float32)
    import jax as _jax
    pfn = gp.predict_fn()
    pred = _jax.jit(lambda q: _jax.vmap(pfn)(q.T)[0])
    t_pred = timeit(lambda: pred(Xq))
    return [("GP fit (256 pts, 300 adam steps, incl compile)", 1.0 / t_fit, t_fit),
            ("GP predict (100k query pts)", 100000 / t_pred, t_pred)]


def main():
    rows = []
    rows += bench_filters()
    mhe_rows, conv = bench_mhe()
    rows += mhe_rows
    print(f"# MHE convergence: {conv:.3f}", file=sys.stderr)
    rows += bench_gp()
    print(f"{'benchmark':44s} {'throughput':>16s} {'time':>10s}")
    for name, thr, t in rows:
        unit = "steps/s" if "KF" in name or "PF" in name else (
            "solves/s" if "MHE" in name else "x/s")
        print(f"{name:44s} {thr:14.0f} {unit:>7s} {t*1e3:8.1f}ms")


if __name__ == "__main__":
    main()
