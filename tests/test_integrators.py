"""Integrator accuracy/order tests (tier (b) numeric unit tests, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu.core.integrators import (
    IntegratorSpec,
    collocation_coefficients,
    collocation_points,
    make_collocation_step,
    make_erk_step,
    make_step,
    newton_solve,
    with_substeps,
)


def _decay(lam=-1.3):
    return lambda x, z, u, p, t: lam * x


class TestCollocationBasis:
    def test_radau_points_d2(self):
        np.testing.assert_allclose(collocation_points(2, "radau"), [1 / 3, 1.0],
                                   atol=1e-12)

    def test_radau_points_d3(self):
        expected = [(4 - np.sqrt(6)) / 10, (4 + np.sqrt(6)) / 10, 1.0]
        np.testing.assert_allclose(collocation_points(3, "radau"), expected, atol=1e-12)

    def test_legendre_points_d2(self):
        expected = [0.5 - np.sqrt(3) / 6, 0.5 + np.sqrt(3) / 6]
        np.testing.assert_allclose(collocation_points(2, "legendre"), expected,
                                   atol=1e-12)

    def test_quadrature_weights_sum_to_one(self):
        for scheme in ("radau", "legendre"):
            for d in (1, 2, 3, 4):
                _, _, B, _ = collocation_coefficients(d, scheme)
                assert abs(B.sum() - 1.0) < 1e-10


class TestERK:
    @pytest.mark.parametrize("method,order", [
        ("euler", 1), ("heun", 2), ("ralston", 2), ("rk3", 3), ("rk4", 4), ("rk38", 4),
    ])
    def test_convergence_order(self, method, order):
        lam = -1.3
        step = make_erk_step(_decay(lam), method=method)
        x0 = jnp.array([1.0])
        errs = []
        for dt in (0.1, 0.05):
            x, _ = step(x0, jnp.zeros(0), jnp.zeros(0), jnp.zeros(0), 0.0, dt)
            errs.append(abs(float(x[0]) - np.exp(lam * dt)))
        rate = np.log2(errs[0] / errs[1])
        assert rate > order - 0.3, f"{method}: observed order {rate}"

    def test_rk4_matches_known_value(self):
        step = make_erk_step(lambda x, z, u, p, t: -x + u, method="rk4")
        x, _ = step(jnp.array([1.0]), jnp.zeros(0), jnp.array([0.5]), jnp.zeros(0),
                    0.0, 0.1)
        # exact solution of x' = -x + 0.5, x(0)=1 at t=0.1
        exact = 0.5 + 0.5 * np.exp(-0.1)
        assert abs(float(x[0]) - exact) < 1e-7

    def test_time_dependent_rhs(self):
        step = make_erk_step(lambda x, z, u, p, t: jnp.atleast_1d(jnp.cos(t)),
                             method="rk4")
        x, _ = step(jnp.array([0.0]), jnp.zeros(0), jnp.zeros(0), jnp.zeros(0),
                    0.0, 0.3)
        assert abs(float(x[0]) - np.sin(0.3)) < 1e-6


class TestCollocation:
    @pytest.mark.parametrize("scheme", ["radau", "legendre"])
    def test_decay_accuracy(self, scheme):
        step = make_collocation_step(_decay(), nx=1, degree=3, scheme=scheme)
        x, _ = step(jnp.array([1.0]), jnp.zeros(0), jnp.zeros(0), jnp.zeros(0),
                    0.0, 0.2)
        assert abs(float(x[0]) - np.exp(-1.3 * 0.2)) < 1e-7

    def test_stiff_stability(self):
        # Radau IIA is L-stable: lambda*dt = -50 must not blow up (RK4 would).
        step = make_collocation_step(_decay(-500.0), nx=1, degree=3, newton_iters=10)
        x = jnp.array([1.0])
        for _ in range(5):
            x, _ = step(x, jnp.zeros(0), jnp.zeros(0), jnp.zeros(0), 0.0, 0.1)
        assert float(jnp.abs(x[0])) < 1.0

    def test_dae_index1(self):
        # x' = -x + z, 0 = z - sin(x): solves algebraic var each step
        ode = lambda x, z, u, p, t: -x + z
        alg = lambda x, z, u, p, t: z - jnp.sin(x)
        step = make_collocation_step(ode, alg, nx=1, nz=1, degree=3, newton_iters=12)
        x, z = step(jnp.array([1.0]), jnp.array([0.8]), jnp.zeros(0), jnp.zeros(0),
                    0.0, 0.05)
        np.testing.assert_allclose(float(z[0]), np.sin(float(x[0])), atol=1e-9)

    def test_gradients_through_newton(self):
        step = make_collocation_step(
            lambda x, z, u, p, t: p[0] * x, nx=1, degree=2)

        def loss(p):
            x, _ = step(jnp.array([1.0]), jnp.zeros(0), jnp.zeros(0), p, 0.0, 0.1)
            return x[0]

        g = jax.grad(loss)(jnp.array([-1.3]))
        # d/dp exp(p*dt) = dt*exp(p*dt); tolerance covers the degree-2 scheme's own
        # truncation error (the gradient is exact for the discrete scheme)
        expected = 0.1 * np.exp(-0.13)
        assert abs(float(g[0]) - expected) < 2e-5


class TestHelpers:
    def test_newton_solve_scalar_system(self):
        res = lambda w: jnp.stack([w[0] ** 2 - 4.0, w[1] - w[0]])
        w = newton_solve(res, jnp.array([1.0, 1.0]), iters=20)
        np.testing.assert_allclose(np.asarray(w), [2.0, 2.0], atol=1e-10)

    def test_newton_implicit_gradient(self):
        # solve w^2 = a  ->  dw/da = 1/(2*sqrt(a))
        def sqrt_via_newton(a):
            return newton_solve(lambda w: w * w - a, jnp.ones_like(a), iters=20)

        g = jax.grad(lambda a: sqrt_via_newton(a)[0])(jnp.array([4.0]))
        assert abs(float(g[0]) - 0.25) < 1e-8

    def test_substeps_improves_accuracy(self):
        f = _decay(-2.0)
        one = make_erk_step(f, method="euler")
        many = with_substeps(one, 16)
        args = (jnp.array([1.0]), jnp.zeros(0), jnp.zeros(0), jnp.zeros(0), 0.0, 0.5)
        e1 = abs(float(one(*args)[0][0]) - np.exp(-1.0))
        e16 = abs(float(many(*args)[0][0]) - np.exp(-1.0))
        assert e16 < e1 / 8

    def test_make_step_dispatch(self):
        for method in ("rk4", "collocation", "cvodes"):
            step = make_step(_decay(), None, 1, 0, IntegratorSpec(method=method))
            x, _ = step(jnp.array([1.0]), jnp.zeros(0), jnp.zeros(0), jnp.zeros(0),
                        0.0, 0.1)
            assert abs(float(x[0]) - np.exp(-0.13)) < 1e-5
