"""SMPC tests (reference tier: tests/test_SMPC.py:87-214 — surrogate construction +
chance-constrained closed loop)."""
import numpy as np
import pytest

from hilo_mpc_tpu import GP, Model, SMPC
from hilo_mpc_tpu.control.smpc import chance_backoff


def make_model():
    import jax.numpy as jnp

    m = Model(name="lin")
    m.set_dynamical_states(["x1", "x2"])
    m.set_inputs("u")
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], -0.5 * x[0] - 0.4 * x[1] + u[0]]))
    return m


def make_gp(seed=0, noise=0.02):
    # GP models a small additive disturbance on x2 as a function of x1
    rng = np.random.default_rng(seed)
    X = np.linspace(-1.5, 1.5, 25)[:, None]
    y = 0.05 * np.sin(2 * X[:, 0]) + noise * rng.standard_normal(25)
    gp = GP(["x1"], ["d"], noise_variance=noise)
    gp.set_training_data(X, y)
    gp.setup()
    return gp


class TestChanceBackoff:
    def test_values(self):
        assert chance_backoff(0.5) == pytest.approx(0.0, abs=1e-12)
        assert chance_backoff(0.9772498680518208) == pytest.approx(2.0, abs=1e-6)

    def test_level_validation(self):
        with pytest.raises(ValueError):
            chance_backoff(0.3)
        with pytest.raises(ValueError):
            chance_backoff(1.0)


class TestSMPC:
    def test_unknown_gp_state_raises(self):
        with pytest.raises(ValueError, match="not a model state"):
            SMPC(make_model(), gps={"nope": make_gp()})

    def test_surrogate_dimensions(self):
        smpc = SMPC(make_model(), gps={"x2": make_gp()}, dt=0.1)
        # 2 mean states + 4 covariance states
        assert smpc._model.n_x == 6
        assert smpc._model.dynamical_states[:2] == ["x1", "x2"]

    def test_covariance_grows_then_solver_converges(self):
        smpc = SMPC(make_model(), gps={"x2": make_gp()}, dt=0.1)
        smpc.horizon = 10
        smpc.quad_stage_cost.add_states(names=["x1", "x2"], weights=[5.0, 1.0])
        smpc.quad_stage_cost.add_inputs(weights=0.1)
        smpc.set_box_constraints(u_lb=-3.0, u_ub=3.0)
        smpc.set_initial_covariance(np.zeros((2, 2)))
        smpc.setup(options={"dt": 0.1})
        u = smpc.optimize([1.0, 0.0])
        assert smpc.stats["converged"]
        pred = smpc.return_prediction()["x"]
        # variance of x2 accumulates along the horizon
        P22 = pred[:, 2 + 3]  # vec index (1,1) of P -> offset 2 + 1*2+1
        assert P22[-1] > P22[1] >= 0.0

    def test_chance_constraint_tightens(self):
        def solve(with_chance):
            smpc = SMPC(make_model(), gps={"x2": make_gp()}, dt=0.1)
            smpc.horizon = 10
            smpc.quad_stage_cost.add_states(names=["x1", "x2"],
                                            weights=[5.0, 1.0], ref=[0.8, 0.0])
            smpc.quad_stage_cost.add_inputs(weights=0.1)
            smpc.set_box_constraints(u_lb=-3.0, u_ub=3.0)
            if with_chance:
                smpc.set_box_chance_constraints(x_ub=[0.9, np.inf], level=0.95)
            else:
                smpc.add_stage_constraint(lambda x: x[0], ub=0.9, n=1)
            smpc.set_initial_covariance(np.eye(2) * 1e-4)
            smpc.setup(options={"dt": 0.1})
            smpc.optimize([0.5, 0.5])
            assert smpc.stats["converged"], smpc.stats
            return smpc.return_prediction()["x"][:, 0].max()

        x_max_hard = solve(False)
        x_max_chance = solve(True)
        # back-off must keep the mean strictly farther from the bound
        assert x_max_chance < x_max_hard
        assert x_max_chance <= 0.9 + 1e-6

    def test_feedback_gain_shrinks_covariance(self):
        def final_var(K):
            smpc = SMPC(make_model(), gps={"x2": make_gp()}, feedback_gain=K,
                        dt=0.1)
            smpc.horizon = 12
            smpc.quad_stage_cost.add_states(names=["x1", "x2"],
                                            weights=[5.0, 1.0])
            smpc.quad_stage_cost.add_inputs(weights=0.1)
            smpc.set_initial_covariance(np.zeros((2, 2)))
            smpc.setup(options={"dt": 0.1})
            smpc.optimize([1.0, 0.0])
            pred = smpc.return_prediction()["x"]
            return pred[-1, 2 + 3]

        v_open = final_var(None)
        v_closed = final_var(np.array([[1.5, 1.2]]))
        assert v_closed < v_open


class TestDisturbanceMatrix:
    def test_gp_list_requires_matrix(self):
        with pytest.raises(ValueError, match="disturbance_matrix"):
            SMPC(make_model(), gps=[make_gp()])

    def test_matrix_shape_validated(self):
        with pytest.raises(ValueError, match="shape"):
            SMPC(make_model(), gps=[make_gp()],
                 disturbance_matrix=np.ones((3, 1)))

    def test_propagation_matches_reference_block_algebra(self):
        # one GP feeding BOTH states through Bw = [[0.3], [1.0]]; the surrogate's
        # covariance update must equal the reference's bigK block form
        # (reference: _create_deterministic_surrogate, mpc.py:2512-2614):
        #   K+ = [Jf Bw] [[Kz, Kz Jgᵀ],[Jg Kz, Kd0 + Jg Kz Jgᵀ]] [Jf Bw]ᵀ
        # evaluated here WITHOUT feedback (Kz = Kx).
        import jax
        import jax.numpy as jnp

        gp = make_gp()
        Bw = np.array([[0.3], [1.0]])
        smpc = SMPC(make_model(), gps=[gp], disturbance_matrix=Bw, dt=0.1)
        xs0 = np.array([0.4, -0.2])
        P0 = np.array([[0.02, 0.005], [0.005, 0.01]])
        u0 = np.array([0.3])
        state = jnp.concatenate([jnp.asarray(xs0), jnp.asarray(P0).ravel()])
        out = np.asarray(smpc._model._ode(state, jnp.zeros(0), jnp.asarray(u0),
                                          jnp.zeros(0), 0.0))
        P_plus = out[2:].reshape(2, 2)

        gp_fn = gp.predict_fn()

        def nominal(x, u):
            dx = jnp.array([x[1], -0.5 * x[0] - 0.4 * x[1] + u[0]])
            return x + 0.1 * dx          # one RK4 step of a linear ODE == euler?

        # use the surrogate's own mean map for Jf to avoid integrator mismatch:
        # Jf must be the jacobian of the NOMINAL part only, so subtract the GP term
        def mean_map(x, u):
            mu = jnp.concatenate([x, jnp.zeros(4)])
            return smpc._model._ode(mu, jnp.zeros(0), u, jnp.zeros(0), 0.0)[:2]

        def gp_d(x, u):
            mu_d, _ = gp_fn(jnp.array([x[0]]))
            return jnp.atleast_1d(jnp.squeeze(mu_d))

        Jfull_x = np.asarray(jax.jacfwd(mean_map)(jnp.asarray(xs0),
                                                  jnp.asarray(u0)))
        Jg = np.asarray(jax.jacfwd(gp_d)(jnp.asarray(xs0), jnp.asarray(u0)))
        Jf = Jfull_x - Bw @ Jg            # nominal-only jacobian
        _, var_d = gp_fn(jnp.array([xs0[0]]))
        Kd0 = np.atleast_2d(float(var_d))

        Kz = P0
        Kzd = Kz @ Jg.T
        Kd = Kd0 + Jg @ Kz @ Jg.T
        bigK = np.block([[Kz, Kzd], [Kzd.T, Kd]])
        JB = np.hstack([Jf, Bw])
        expected = JB @ bigK @ JB.T
        np.testing.assert_allclose(P_plus, expected, rtol=1e-6, atol=1e-10)

    def test_shared_gp_induces_cross_covariance(self):
        # starting from P0 = 0, a single GP feeding both states must induce a
        # CORRELATED covariance (off-diagonal = Bw_0 Bw_1 var) after one step
        import jax.numpy as jnp

        gp = make_gp()
        Bw = np.array([[0.5], [1.0]])
        smpc = SMPC(make_model(), gps=[gp], disturbance_matrix=Bw, dt=0.1)
        state = jnp.concatenate([jnp.array([0.4, -0.2]), jnp.zeros(4)])
        out = np.asarray(smpc._model._ode(state, jnp.zeros(0), jnp.array([0.0]),
                                          jnp.zeros(0), 0.0))
        P_plus = out[2:].reshape(2, 2)
        gp_fn = gp.predict_fn()
        _, var_d = gp_fn(jnp.array([0.4]))
        np.testing.assert_allclose(P_plus, float(var_d) * Bw @ Bw.T, rtol=1e-6)


class TestChanceConstraintMonteCarlo:
    def test_violation_rate_within_level(self):
        # closed loop under disturbances drawn from the fitted GP: the 95%
        # back-off must keep the empirical per-step violation rate low
        rng = np.random.default_rng(2)
        gp = make_gp(seed=2, noise=0.02)
        smpc = SMPC(make_model(), gps={"x2": gp}, dt=0.1)
        smpc.horizon = 8
        smpc.quad_stage_cost.add_states(names=["x1", "x2"], weights=[5.0, 1.0],
                                        ref=[0.75, 0.0])
        smpc.quad_stage_cost.add_inputs(weights=0.1)
        smpc.set_box_constraints(u_lb=-3.0, u_ub=3.0)
        smpc.set_box_chance_constraints(x_ub=[0.8, np.inf], level=0.95)
        smpc.set_initial_covariance(np.eye(2) * 1e-6)
        smpc.setup(options={"dt": 0.1})

        import jax.numpy as jnp
        gp_fn = gp.predict_fn()

        def plant_step(x, u, w):
            # true plant: nominal + GP-mean disturbance + residual noise scaled
            # by the GP's predictive std (the uncertainty SMPC propagates)
            dx = np.array([x[1], -0.5 * x[0] - 0.4 * x[1] + u[0]])
            x_new = x + 0.1 * dx
            mu_d, var_d = gp_fn(jnp.array([x[1]]))
            x_new[1] += float(mu_d) + w * float(np.sqrt(var_d))
            return x_new

        n_steps, n_runs, violations, total = 12, 8, 0, 0
        for run in range(n_runs):
            x = np.array([0.0, 0.0])
            smpc._warm = None
            for k in range(n_steps):
                u = smpc.optimize(x)
                x = plant_step(x, u, rng.standard_normal())
                total += 1
                if x[0] > 0.8:
                    violations += 1
        rate = violations / total
        # 95% level -> expect <=5% violations; allow sampling slack
        assert rate <= 0.12, f"violation rate {rate:.2%}"
        # and the constraint is actually active (mean approaches the bound)
        assert smpc.return_prediction()["x"][:, 0].max() > 0.5
