"""Multi-chip scenario sharding.

The reference is single-process CPU (SURVEY.md §2.9); this module is the scale-out layer
it never had: scenario batches (initial states, parameter draws, MHE windows) are sharded
over a `jax.sharding.Mesh` with the batch axis on ICI/DCN ("dp" axis), the stagewise
solves run independently per scenario, and cross-scenario reductions (convergence
statistics, objective summaries) ride XLA collectives inserted by `jit` from the
sharding annotations — the scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a device mesh. Default: 1-D "dp" mesh over all (or first n) devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place a pytree of arrays with the leading (batch) dim sharded over `axis`."""
    def put(x):
        x = jnp.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated across the mesh."""
    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def batch_stats(solution) -> dict:
    """In-jit reduction of a batched OCPSolution to scalar statistics.

    Pure jnp — when the solution's leading axis is sharded over a mesh, XLA
    lowers these reductions to `all-reduce` collectives over ICI/DCN (the
    scaling-book pattern: annotate shardings, let the compiler insert psum),
    so convergence monitoring never gathers the batch to one host. jnp.median
    is sort-based and costs an all-gather of the (scalar-per-scenario) stat
    columns only — negligible next to the solves.
    """
    conv = solution.converged
    return {
        "n": jnp.asarray(conv.size, jnp.int32),
        "n_converged": jnp.sum(conv.astype(jnp.int32)),
        "rate": jnp.mean(conv.astype(jnp.float32)),
        "iterations_p50": jnp.median(solution.iterations.astype(jnp.float32)),
        "iterations_max": jnp.max(solution.iterations),
        "kkt_p50": jnp.median(solution.kkt_error),
        "kkt_max": jnp.max(solution.kkt_error),
    }


def sharded_solve_fn(nmpc, mesh: Mesh, axis: str = "dp", donate: bool = False,
                     with_stats: bool = False):
    """Build a jitted multi-chip batched NMPC solve.

    Returns fn(theta_B, xs0_B, X_B, U_B) -> OCPSolution with every leading-axis array
    sharded over `axis`. The per-scenario interior-point solves are embarrassingly
    parallel; jit partitions the vmap over the mesh so each chip runs its shard. With
    ``with_stats=True`` the fn returns (solution, stats) where stats are scalar
    reductions computed INSIDE the jit (psum/max collectives over the mesh) — the
    multi-host-safe replacement for host-side numpy reductions.
    """
    from ..ops.ip_solver import solve_ocp

    solver = partial(solve_ocp, nmpc._funcs, nmpc._dims,
                     options=nmpc._ip_opts, fix_x0=True)
    bounds = nmpc._bounds

    def solve_many(theta_B, xs0_B, X_B, U_B):
        sol = jax.vmap(lambda th, x0, Xi, Ui: solver(bounds, th, x0, Xi, Ui)
                       )(theta_B, xs0_B, X_B, U_B)
        if with_stats:
            return sol, batch_stats(sol)
        return sol

    in_shardings = tuple(
        NamedSharding(mesh, P(axis)) for _ in range(4))
    return jax.jit(solve_many, in_shardings=in_shardings,
                   donate_argnums=(2, 3) if donate else ())


def convergence_stats(solution) -> dict:
    """Host-side reduction of a batched OCPSolution into summary statistics
    (the reference's per-solve stats table, batched: solver status decode,
    optimizer.py:957-1085)."""
    conv = np.asarray(solution.converged)
    return {
        "n": int(conv.size),
        "n_converged": int(conv.sum()),
        "rate": float(conv.mean()),
        "iterations_p50": float(np.median(np.asarray(solution.iterations))),
        "iterations_max": int(np.max(np.asarray(solution.iterations))),
        "kkt_p50": float(np.median(np.asarray(solution.kkt_error))),
        "kkt_max": float(np.max(np.asarray(solution.kkt_error))),
    }
