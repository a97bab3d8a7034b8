"""KF/EKF/UKF/PF/MHE tests (reference tiers: tests/test_KFs.py, test_PFs.py,
test_MHE.py — construction/validation + estimation convergence)."""
import numpy as np
import pytest

from hilo_mpc_tpu import EKF, KF, MHE, PF, UKF, Model


def linear_model():
    m = Model()
    m.set_state_space(A=[[0.0, 1.0], [-2.0, -0.8]], B=[[0.0], [1.0]],
                      C=[[1.0, 0.0]])
    return m


def pendulum():
    import jax.numpy as jnp

    m = Model(name="pend")
    m.set_dynamical_states(["th", "om"])
    m.set_inputs("tau")
    m.set_measurements(["y_th"])
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) - 0.3 * x[1] + u[0]]))
    m.set_measurement_equations(lambda x: x[:1])
    return m


def simulate_noisy(model, x0, steps, dt=0.05, meas_std=0.01, seed=0, u_mag=0.2):
    rng = np.random.default_rng(seed)
    model.setup(dt=dt, integration_method="rk4")
    model.set_initial_conditions(x0)
    U = u_mag * np.sin(np.linspace(0, 4, steps))[:, None]
    out = model.simulate(u=U, steps=steps)
    Y = out["y"] + meas_std * rng.standard_normal(out["y"].shape)
    return out["x"], U, Y


class TestConstruction:
    def test_kf_requires_linear(self):
        with pytest.raises(ValueError, match="linear"):
            KF(pendulum())

    def test_cov_setters_validate(self):
        kf = KF(linear_model())
        with pytest.raises(ValueError):
            kf.Q = np.ones((3, 3))
        with pytest.raises(ValueError):
            kf.R = [[1.0, 0.5], [0.4, 1.0]]  # not symmetric

    def test_ukf_params_validate(self):
        ukf = UKF(pendulum())
        with pytest.raises(ValueError):
            ukf.alpha = 2.0
        with pytest.raises(ValueError):
            ukf.kappa = -1.0

    def test_estimate_before_setup(self):
        with pytest.raises(RuntimeError):
            EKF(pendulum()).estimate(np.zeros(1))

    def test_pf_particle_count(self):
        with pytest.raises(ValueError):
            PF(pendulum(), n_particles=0)


class TestKalman:
    @pytest.mark.parametrize("cls", [EKF, UKF])
    def test_pendulum_state_reconstruction(self, cls):
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=80)
        est = cls(pendulum())
        est.Q = 1e-5
        est.R = 1e-4
        est.setup(dt=0.05)
        est.set_initial_guess([0.3, 0.2], P0=np.eye(2) * 0.3)
        x_hat = est.estimate(Y, u=U)
        err = np.abs(x_hat - X[-1])
        assert err[0] < 0.02 and err[1] < 0.1

    def test_kf_linear_matches_ekf(self):
        plant = linear_model()
        X, U, Y = simulate_noisy(plant, [1.0, 0.0], steps=40)
        results = []
        for cls in (KF, EKF):
            est = cls(linear_model())
            est.Q = 1e-5
            est.R = 1e-4
            est.setup(dt=0.05)
            est.set_initial_guess([0.5, 0.5], P0=np.eye(2))
            results.append(est.estimate(Y, u=U))
        np.testing.assert_allclose(results[0], results[1], atol=1e-10)

    def test_covariance_stays_psd(self):
        est = EKF(pendulum())
        est.setup(dt=0.05)
        est.set_initial_guess([0.0, 0.0])
        est.estimate(np.zeros((20, 1)))
        P = est._P
        assert np.all(np.linalg.eigvalsh(P) > -1e-12)


class TestParticleFilter:
    def test_pendulum_tracking(self):
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=60, meas_std=0.02)
        pf = PF(pendulum(), n_particles=400, seed=1)
        pf.Q = 1e-4
        pf.R = 4e-4
        pf.setup(dt=0.05)
        pf.set_initial_guess([0.4, 0.1], P0=np.eye(2) * 0.1)
        x_hat = pf.estimate(Y, u=U)
        assert np.abs(x_hat[0] - X[-1, 0]) < 0.05

    def test_lhs_sampling_stats(self):
        from hilo_mpc_tpu.estimation.pf import lhsnorm

        S = lhsnorm([1.0, -2.0], np.diag([0.04, 0.09]), 2000, seed=0)
        np.testing.assert_allclose(S.mean(axis=0), [1.0, -2.0], atol=0.02)
        np.testing.assert_allclose(S.std(axis=0), [0.2, 0.3], atol=0.02)


class TestMHE:
    def test_window_buffering(self):
        mhe = MHE(pendulum())
        mhe.horizon = 5
        mhe.setup(dt=0.05)
        mhe.set_initial_guess([0.0, 0.0])
        for k in range(5):
            assert mhe.estimate(y=[0.1], u=[0.0]) is None
        assert mhe.estimate(y=[0.1], u=[0.0]) is not None

    def test_state_reconstruction(self):
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=40, meas_std=0.005)
        mhe = MHE(pendulum())
        mhe.horizon = 10
        mhe.Q = 1e-5
        mhe.R = 1e-4
        mhe.P0 = np.eye(2) * 0.2
        mhe.setup(dt=0.05)
        mhe.set_initial_guess([0.3, 0.2])
        x_hat = None
        for k in range(40):
            res = mhe.estimate(y=Y[k], u=U[k])
            if res is not None:
                x_hat = res
        assert x_hat is not None
        assert mhe.stats["converged"]
        err = np.abs(x_hat - X[-1])
        assert err[0] < 0.02 and err[1] < 0.1

    def test_parameter_estimation(self):
        # estimate the damping coefficient of a decay model
        import jax.numpy as jnp

        plant = Model()
        plant.set_dynamical_states("x")
        plant.set_parameters("a")
        plant.set_dynamical_equations(lambda x, p: -p[0] * x)
        plant.setup(dt=0.1, integration_method="rk4")
        plant.set_initial_conditions([2.0])
        plant.set_initial_parameter_values([0.7])
        out = plant.simulate(steps=30)
        Y = out["x"]  # full-state measurement

        est_model = Model()
        est_model.set_dynamical_states("x")
        est_model.set_parameters("a")
        est_model.set_dynamical_equations(lambda x, p: -p[0] * x)
        mhe = MHE(est_model)
        mhe.horizon = 10
        mhe.Q = 1e-6
        mhe.R = 1e-6
        mhe.P0 = np.eye(1) * 10.0
        mhe.set_estimated_parameters(["a"], guess=[0.3],
                                     arrival_weight=[[1e-2]])
        mhe.setup(dt=0.1)
        mhe.set_initial_guess([2.0])
        p_hat = None
        for k in range(30):
            res = mhe.estimate(y=Y[k])
            if res is not None:
                _, p_hat = res
        assert p_hat is not None
        assert abs(p_hat[0] - 0.7) < 0.02


class TestMHEMissingData:
    def test_nan_measurements_are_skipped(self):
        """NaN marks a missing sample: with 30% of the window dropped, the
        estimate stays finite and close to the truth (the reference MHE has no
        missing-data path; a NaN would poison its NLP)."""
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=40, meas_std=0.005)
        Y = Y.copy()
        rng = np.random.default_rng(3)
        drop = rng.random(40) < 0.3
        drop[-1] = False              # keep the final node observed
        Y[drop] = np.nan
        mhe = MHE(pendulum())
        mhe.horizon = 10
        mhe.Q = 1e-5
        mhe.R = 1e-4
        mhe.P0 = np.eye(2) * 0.2
        mhe.setup(dt=0.05)
        mhe.set_initial_guess([0.3, 0.2])
        x_hat = None
        for k in range(40):
            res = mhe.estimate(y=Y[k], u=U[k])
            if res is not None:
                x_hat = res
                assert np.all(np.isfinite(x_hat))
        assert mhe.stats["converged"]
        err = np.abs(x_hat - X[-1])
        assert err[0] < 0.03 and err[1] < 0.15

    def test_per_channel_masking(self):
        """Two-output model where one channel drops out: the other channel keeps
        carrying information (per-channel, not per-node masking)."""
        import jax.numpy as jnp

        m = Model()
        m.set_dynamical_states(["a", "b"])
        m.set_measurements(["ya", "yb"])
        m.set_dynamical_equations(lambda x: jnp.array([-0.5 * x[0],
                                                       -0.2 * x[1]]))
        m.set_measurement_equations(lambda x: jnp.array([x[0], x[1]]))
        m.setup(dt=0.1)
        m.set_initial_conditions([2.0, 1.0])
        out = m.simulate(steps=30)
        Y = out["y"].copy()
        Y[10:25, 1] = np.nan          # channel b unobserved for 15 steps
        mhe = MHE(m.copy())
        mhe.horizon = 8
        mhe.Q = 1e-5
        mhe.R = 1e-4
        mhe.P0 = np.eye(2) * 0.5
        mhe.setup(dt=0.1)
        mhe.set_initial_guess([1.5, 1.5])
        x_hat = None
        for k in range(30):
            res = mhe.estimate(y=Y[k])
            if res is not None:
                x_hat = res
                assert np.all(np.isfinite(x_hat))
        x_true = out["x"][-1]
        # channel a observed throughout -> tight; b recovered after dropout
        assert abs(x_hat[0] - x_true[0]) < 1e-2
        assert abs(x_hat[1] - x_true[1]) < 5e-2

    def test_batched_windows_accept_nan(self):
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=30, meas_std=0.005)
        N = 10
        Y = Y.copy()
        Y[7] = np.nan
        mhe = MHE(pendulum())
        mhe.horizon = N
        mhe.Q = 1e-5
        mhe.R = 1e-4
        mhe.P0 = np.eye(2) * 0.2
        mhe.setup(dt=0.05)
        mhe.set_initial_guess([0.4, 0.1])
        starts = [0, 5]
        Ys = np.stack([Y[s:s + N + 1] for s in starts])
        Us = np.stack([U[s:s + N + 1] for s in starts])
        x_arr = np.stack([X[s] for s in starts])
        x_est, sol = mhe.estimate_batch(Ys, Us, x_arrivals=x_arr)
        assert np.all(np.isfinite(x_est))
        assert bool(np.asarray(sol.converged).all())
        x_true = np.stack([X[s + N] for s in starts])
        assert np.max(np.abs(x_est - x_true)) < 0.06


class TestBatchedMHE:
    def test_batched_windows_match_sequential(self):
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=30, meas_std=0.005)
        N = 10
        mhe = MHE(pendulum())
        mhe.horizon = N
        mhe.Q = 1e-5
        mhe.R = 1e-4
        mhe.P0 = np.eye(2) * 0.2
        mhe.setup(dt=0.05)
        mhe.set_initial_guess([0.4, 0.1])
        # build 4 overlapping windows from the same run; pair rows like estimate():
        # window row k holds (y_{start+k}, u applied after that measurement)
        starts = [0, 5, 10, 15]
        Ys = np.stack([Y[s:s + N + 1] for s in starts])
        # estimate() pairing: row k = (y_k, the u whose application produced y_k);
        # simulate gives Y[j] produced by U[j], so rows align at the same index
        Us = np.stack([U[s:s + N + 1] for s in starts])
        x_arr = np.stack([X[s] for s in starts])
        x_est, sol = mhe.estimate_batch(Ys, Us, x_arrivals=x_arr)
        assert x_est.shape == (4, 2)
        assert bool(np.asarray(sol.converged).all())
        # each window's estimate should be near the true state at its end
        x_true = np.stack([X[s + N] for s in starts])
        assert np.max(np.abs(x_est - x_true)) < 0.05


class TestEstimatorOptions:
    def test_pf_roughening_spreads_particles(self):
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=10, meas_std=0.01)

        def run(rough):
            pf = PF(pendulum(), n_particles=200, roughening=rough, seed=0)
            pf.Q = 1e-6   # tiny process noise: particle collapse without roughening
            pf.R = 1e-4
            pf.setup(dt=0.05)
            pf.set_initial_guess([0.4, 0.1], P0=np.eye(2) * 0.05)
            pf.estimate(Y, u=U)
            return np.std(pf.particles, axis=0).sum()

        assert run(True) > run(False)

    def test_mhe_process_noise_bound(self):
        # w_bound=0 forbids process noise: MHE reduces to trajectory fitting
        plant = pendulum()
        X, U, Y = simulate_noisy(plant, [0.5, 0.0], steps=15, meas_std=0.02)
        mhe = MHE(pendulum())
        mhe.horizon = 8
        mhe.Q = 1e-4
        mhe.R = 1e-4
        mhe.set_box_constraints(w_bound=0.0)
        mhe.setup(dt=0.05)
        mhe.set_initial_guess([0.4, 0.1])
        x_hat = None
        for k in range(15):
            res = mhe.estimate(y=Y[k], u=U[k])
            if res is not None:
                x_hat = res
        assert x_hat is not None and np.all(np.isfinite(x_hat))
        # recorded process noise is held near zero by the solver's stiff
        # control pinning (w_pin=1e7 => residual ~ gradient/1e7)
        w = mhe.solution.get("w")
        assert np.nanmax(np.abs(w)) < 1e-3

    def test_ukf_kappa_changes_weights(self):
        ukf1 = UKF(pendulum(), alpha=1e-3, kappa=0.0)
        ukf2 = UKF(pendulum(), alpha=0.5, kappa=2.0)
        import jax.numpy as jnp

        _, wm1, _ = ukf1._weights(2, jnp.float64)
        _, wm2, _ = ukf2._weights(2, jnp.float64)
        # weights always sum to one but differ with scaling parameters
        np.testing.assert_allclose(float(wm1.sum()), 1.0, atol=1e-9)
        np.testing.assert_allclose(float(wm2.sum()), 1.0, atol=1e-9)
        assert not np.allclose(np.asarray(wm1), np.asarray(wm2))


class TestPredictUpdateSplit:
    """Separate predict/update entry points (reference: tests/test_KFs.py:488-522,
    716-757 exercise kf.predict / kf.update standalone)."""

    def _ekf(self):
        import jax.numpy as jnp

        from hilo_mpc_tpu import ExtendedKalmanFilter, Model

        m = Model(name="pend")
        m.set_dynamical_states(["phi", "omega"])
        m.set_inputs("tau")
        m.set_measurements(["y_phi"])
        m.set_measurement_equations(lambda x, u: jnp.atleast_1d(x[0]))
        m.set_dynamical_equations(
            lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) + u[0]]))
        ekf = ExtendedKalmanFilter(m)
        ekf.Q = 0.01 * np.eye(2)
        ekf.R = 0.1 * np.eye(1)
        ekf.setup(dt=0.1)
        ekf.set_initial_guess([0.2, 0.0])
        return ekf

    def test_predict_then_update_equals_estimate(self):
        ekf = self._ekf()
        u = np.array([0.3])
        y = np.array([0.25])
        x_pr, P_pr = ekf.predict(u=u)
        x_up, P_up, y_pr = ekf.update(x_pr, P_pr, y, u=u, t=0.1)
        x_est = ekf.estimate(y=y, u=u)
        np.testing.assert_allclose(x_up, x_est, atol=1e-6)
        # update contracts the covariance along the measured direction
        assert P_up[0, 0] < P_pr[0, 0]

    def test_predict_grows_uncertainty(self):
        ekf = self._ekf()
        x_pr, P_pr = ekf.predict(u=np.zeros(1))
        assert np.trace(P_pr) > np.trace(np.asarray(ekf._P)) - 1e-12

    def test_predict_is_pure(self):
        ekf = self._ekf()
        P_before = np.array(ekf._P)
        ekf.predict(u=np.zeros(1))
        np.testing.assert_allclose(np.asarray(ekf._P), P_before)

    def test_ukf_split_matches_step(self):
        import jax.numpy as jnp

        from hilo_mpc_tpu import Model, UnscentedKalmanFilter

        m = Model(name="pend2")
        m.set_dynamical_states(["phi", "omega"])
        m.set_inputs("tau")
        m.set_measurements(["y_phi"])
        m.set_measurement_equations(lambda x, u: jnp.atleast_1d(x[0]))
        m.set_dynamical_equations(
            lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) + u[0]]))
        ukf = UnscentedKalmanFilter(m)
        ukf.Q = 0.01 * np.eye(2)
        ukf.R = 0.1 * np.eye(1)
        ukf.setup(dt=0.1)
        ukf.set_initial_guess([0.2, 0.0])
        u, y = np.array([0.3]), np.array([0.25])
        x_pr, P_pr = ukf.predict(u=u)
        x_up, _, _ = ukf.update(x_pr, P_pr, y, u=u, t=0.1)
        x_est = ukf.estimate(y=y, u=u)
        np.testing.assert_allclose(x_up, x_est, atol=1e-6)


def test_mhe_playbook_options_match_defaults():
    """The NMPC solver playbook passes through MHE.setup and leaves the
    estimates unchanged (docs/PERFORMANCE.md MHE section; measured 5.9x on
    chip). Pin both the option plumbing and the estimate parity."""
    import numpy as np

    from hilo_mpc_tpu import MHE
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

    def build(**opts):
        mhe = MHE(cstr_schaffner_and_zeitz(), plot_backend=None)
        mhe.horizon = 6
        mhe.Q = 1e-4
        mhe.R = 1e-3
        mhe.P0 = np.eye(2) * 0.1
        mhe.set_initial_parameter_values([1.0] * 6)
        mhe.setup(dt=0.1, options=opts)
        mhe.set_initial_guess([0.25, 0.15])
        return mhe

    rng = np.random.default_rng(5)
    ys = 0.25 + 0.01 * rng.standard_normal((8, 7, 1))
    us = np.zeros((8, 7, 1))
    arr = np.tile([0.25, 0.15], (8, 1))
    x_def, sol_def = build().estimate_batch(ys, us, x_arrivals=arr)
    x_pb, sol_pb = build(
        n_linesearch=1, convexify=False, riccati_unroll=6,
        max_iter=25).estimate_batch(ys, us, x_arrivals=arr)
    assert np.asarray(sol_def.converged).all()
    assert np.asarray(sol_pb.converged).all()
    np.testing.assert_allclose(x_pb, x_def, atol=5e-5)
