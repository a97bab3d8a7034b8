"""Whole-solve Pallas IP kernel (ops/pallas_ip.py) vs the general XLA path.

Runs in interpret mode on the CPU mesh; the kernel computes in f32 while the
reference path runs f64 (x64 is on in conftest), so solution agreement at
~1e-4 exercises exactly the production regime (f32 kernel vs IPOPT-grade
reference — SURVEY.md §4(d) parity tier).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from hilo_mpc_tpu import NMPC, Model
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz
from hilo_mpc_tpu.ops.ip_solver import solve_ocp
from hilo_mpc_tpu.ops.pallas_ip import (pallas_full_supported,
                                        solve_ocp_pallas_full)


def _flagship(N=8, **opts):
    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = N
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=[0.3, 0.18055])
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_parameters([1.0] * 6)
    o = {"dt": 0.1, "integration_method": "rk4", "tol": 1e-4, "max_iter": 10,
         "convexify": False, "n_linesearch": 1, "mu_init": 1e-2,
         "mehrotra": False}
    o.update(opts)
    nmpc.setup(options=o)
    return nmpc


def _batch(nmpc, B, seed=0):
    rng = np.random.default_rng(seed)
    x0s = np.array([0.2, 0.1]) + 0.05 * rng.standard_normal((B, 2))
    return nmpc.prepare_batch(x0s)


def _ref_solve(nmpc, args):
    solver = partial(solve_ocp, nmpc._funcs, nmpc._dims,
                     options=nmpc._ip_opts, fix_x0=True)
    return jax.vmap(lambda th, x0, Xi, Ui: solver(nmpc._bounds, th, x0, Xi, Ui)
                    )(*args)


def test_matches_general_path_flagship():
    nmpc = _flagship(N=5)
    args = _batch(nmpc, 6)
    sol_ref = _ref_solve(nmpc, args)
    sol_pl = solve_ocp_pallas_full(nmpc._funcs, nmpc._dims, nmpc._bounds,
                                   *args, options=nmpc._ip_opts, tile_b=8)
    assert np.asarray(sol_pl.converged).all()
    assert np.array_equal(np.asarray(sol_pl.iterations),
                          np.asarray(sol_ref.iterations))
    np.testing.assert_allclose(np.asarray(sol_pl.U), np.asarray(sol_ref.U),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(sol_pl.X), np.asarray(sol_ref.X),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(sol_pl.objective),
                               np.asarray(sol_ref.objective), rtol=1e-4)
    # multipliers/slacks in the full (N, m) layout, masked rows pinned at 1.0
    m = 2 * nmpc._dims.nu + 2 * nmpc._dims.nx
    assert sol_pl.s.shape == (6, 5, m)
    np.testing.assert_allclose(np.asarray(sol_pl.s[:, 1:, 2:]), 1.0)  # x rows off
    np.testing.assert_allclose(np.asarray(sol_pl.s[:, :, :2]),
                               np.asarray(sol_ref.s[:, :, :2]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(sol_pl.z[:, :, :2]),
                               np.asarray(sol_ref.z[:, :, :2]), atol=5e-4)


def test_active_state_and_terminal_bounds():
    # state box + terminal rows active: exercises x-row condensation and the
    # terminal slack/dual block
    nmpc = _flagship(N=4)
    nmpc.set_box_constraints(x_lb=[0.0, 0.0], x_ub=[0.29, 0.8],
                             u_lb=[-5.0], u_ub=[5.0])
    nmpc.setup(options={"dt": 0.1, "integration_method": "rk4", "tol": 1e-4,
                        "max_iter": 12, "convexify": False, "n_linesearch": 1,
                        "mu_init": 1e-2, "mehrotra": False})
    args = _batch(nmpc, 5, seed=3)
    sol_ref = _ref_solve(nmpc, args)
    sol_pl = solve_ocp_pallas_full(nmpc._funcs, nmpc._dims, nmpc._bounds,
                                   *args, options=nmpc._ip_opts, tile_b=8)
    conv = np.asarray(sol_ref.converged)
    assert conv.mean() > 0.7   # the tight x_ub makes one seed-3 scenario hard
    assert (np.asarray(sol_pl.converged) == conv).all()
    np.testing.assert_allclose(np.asarray(sol_pl.U)[conv],
                               np.asarray(sol_ref.U)[conv], atol=1e-3)
    # state bound respected
    assert np.asarray(sol_pl.X)[conv, 1:, 0].max() <= 0.29 + 1e-3


def test_padding_lanes_and_batch_not_multiple_of_tile():
    nmpc = _flagship(N=5)
    args = _batch(nmpc, 7, seed=1)     # 7 lanes in a 128-lane tile
    sol_ref = _ref_solve(nmpc, args)
    sol_pl = solve_ocp_pallas_full(nmpc._funcs, nmpc._dims, nmpc._bounds,
                                   *args, options=nmpc._ip_opts, tile_b=8)
    assert sol_pl.U.shape == (7, 5, 1)
    assert np.asarray(sol_pl.converged).all()
    np.testing.assert_allclose(np.asarray(sol_pl.U), np.asarray(sol_ref.U),
                               atol=5e-4)


def test_solve_batch_fn_engages_kernel():
    nmpc = _flagship(N=4, pallas_full=True, pallas_tile=8)
    args = _batch(nmpc, 4, seed=2)
    sol = nmpc.solve_batch_fn()(*args)
    assert np.asarray(sol.converged).all()
    # warm-start variant compiles and converges faster or equal
    X_w = jnp.concatenate([sol.X[:, 1:], sol.X[:, -1:]], axis=1)
    X_w = X_w.at[:, 0, :].set(jnp.asarray(args[1], X_w.dtype))
    U_w = jnp.concatenate([sol.U[:, 1:], sol.U[:, -1:]], axis=1)
    sol_w = nmpc.solve_batch_fn(warm=True)(args[0], args[1], X_w, U_w)
    assert np.asarray(sol_w.converged).all()
    assert (np.asarray(sol_w.iterations) <= np.asarray(sol.iterations)).all()


def test_pack_layouts_agree():
    # pack=8 (full-VREG sublane packing) is a pure layout change of the
    # whole-solve kernel: identical math, bit-comparable trajectories
    nmpc = _flagship(N=4)
    args = _batch(nmpc, 4, seed=7)
    sol1 = solve_ocp_pallas_full(nmpc._funcs, nmpc._dims, nmpc._bounds,
                                 *args, options=nmpc._ip_opts, tile_b=8,
                                 pack=1)
    sol8 = solve_ocp_pallas_full(nmpc._funcs, nmpc._dims, nmpc._bounds,
                                 *args, options=nmpc._ip_opts, tile_b=8,
                                 pack=8)
    assert np.array_equal(np.asarray(sol1.iterations),
                          np.asarray(sol8.iterations))
    np.testing.assert_allclose(np.asarray(sol1.U), np.asarray(sol8.U),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol1.X), np.asarray(sol8.X),
                               rtol=1e-6, atol=1e-6)


def test_supported_gate():
    nmpc = _flagship(N=4)
    assert pallas_full_supported(nmpc._dims, nmpc._bounds, nmpc._ip_opts, True)
    # mehrotra, linesearch, generic constraints disqualify
    nm2 = _flagship(N=4, mehrotra=True)
    assert not pallas_full_supported(nm2._dims, nm2._bounds, nm2._ip_opts, True)
    nm3 = _flagship(N=4, n_linesearch=6)
    assert not pallas_full_supported(nm3._dims, nm3._bounds, nm3._ip_opts, True)
    nm4 = _flagship(N=4)
    nm4.add_stage_constraint(fn=lambda x, u, p, t: x[0] * u[0], ub=[1.0], n=1)
    nm4.setup(options={"dt": 0.1, "integration_method": "rk4",
                       "convexify": False, "n_linesearch": 1,
                       "mehrotra": False})
    assert not pallas_full_supported(nm4._dims, nm4._bounds, nm4._ip_opts, True)
    # unsupported shape falls back to the XLA path with a warning
    nm4._ip_opts = __import__("dataclasses").replace(nm4._ip_opts,
                                                     pallas_full=True)
    with pytest.warns(UserWarning, match="pallas_full"):
        fn = nm4.solve_batch_fn()
    args = _batch(nm4, 3, seed=5)
    assert np.asarray(fn(*args).converged).all()


def test_unconstrained_problem():
    # no finite bounds anywhere: R_s == R_t == 0 (pure equality-dynamics Newton)
    nmpc = _flagship(N=5)
    nmpc.set_box_constraints()          # clears to ±inf
    nmpc.setup(options={"dt": 0.1, "integration_method": "rk4", "tol": 1e-4,
                        "max_iter": 10, "convexify": False, "n_linesearch": 1,
                        "mu_init": 1e-2, "mehrotra": False})
    args = _batch(nmpc, 4, seed=4)
    sol_ref = _ref_solve(nmpc, args)
    sol_pl = solve_ocp_pallas_full(nmpc._funcs, nmpc._dims, nmpc._bounds,
                                   *args, options=nmpc._ip_opts, tile_b=8)
    assert np.asarray(sol_pl.converged).all()
    np.testing.assert_allclose(np.asarray(sol_pl.U), np.asarray(sol_ref.U),
                               atol=5e-4)
