"""AOT export of compiled functions (deployment artifacts).

The reference emits C via `generate_c_code`, compiles a shared object, and reloads it
with `ca.external` (reference: hilo_mpc/util/util.py:240-266, modules/base.py:320-360).
The XLA-native analogue: serialize the lowered StableHLO of any jitted function
(a model step, a batched NMPC solve) with `jax.export`, ship the artifact, and reload
it into any process with a compatible backend — no retracing, no Python model code
needed at the deployment site.
"""
from __future__ import annotations

from typing import Callable

import jax


def export_function(fn: Callable, example_args, path: str,
                    platforms=None) -> str:
    """Serialize the StableHLO of `jit(fn)` specialized to example_args' shapes."""
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn), platforms=platforms)(*example_args)
    data = exp.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_function(path: str) -> Callable:
    """Reload an exported function; returns a callable running the compiled code."""
    from jax import export as jexport

    with open(path, "rb") as f:
        data = f.read()
    exp = jexport.deserialize(data)
    return exp.call


def export_model_step(model, path: str, batch: int = 0) -> str:
    """Export a Model's one-step transition (optionally batched) as an artifact."""
    import jax.numpy as jnp

    if not model.is_setup():
        raise RuntimeError("model.setup(dt=...) first")
    step = model.step_fn_raw
    dt = model.dt
    dtype = model.dtype

    def stepper(x, z, u, p):
        return step(x, z, u, p, 0.0, dt)

    shapes = (jnp.zeros(model.n_x, dtype), jnp.zeros(model.n_z, dtype),
              jnp.zeros(model.n_u, dtype), jnp.zeros(model.n_p, dtype))
    if batch:
        stepper = jax.vmap(stepper)
        shapes = tuple(jnp.zeros((batch,) + s.shape, dtype) for s in shapes)
    return export_function(stepper, shapes, path)


def export_nmpc_solver(nmpc, path: str, batch: int = 0) -> str:
    """Export the (optionally batched) NMPC solve as a deployment artifact."""
    import numpy as np

    import jax.numpy as jnp

    from functools import partial

    from ..ops.ip_solver import solve_ocp

    solver = partial(solve_ocp, nmpc._funcs, nmpc._dims,
                     options=nmpc._ip_opts, fix_x0=True)
    bounds = nmpc._bounds
    dtype = nmpc._solver_dtype
    N, nxs, nus = nmpc._dims.N, nmpc._dims.nx, nmpc._dims.nu

    def solve(theta, xs0, X_init, U_init):
        sol = solver(bounds, theta, xs0, X_init, U_init)
        return sol.X, sol.U, sol.converged, sol.kkt_error

    shapes = (jnp.zeros((N + 1, nmpc._n_theta), dtype), jnp.zeros(nxs, dtype),
              jnp.zeros((N + 1, nxs), dtype), jnp.zeros((N, nus), dtype))
    fn = solve
    if batch:
        fn = jax.vmap(solve)
        shapes = tuple(jnp.zeros((batch,) + s.shape, dtype) for s in shapes)
    return export_function(fn, shapes, path)
