"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4(e): fake-cluster tier the reference lacks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hilo_mpc_tpu import NMPC
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz
from hilo_mpc_tpu.parallel import (convergence_stats, make_mesh, replicate,
                                   shard_batch, sharded_solve_fn)

CSTR_P = [1.0] * 6


def make_nmpc(N=8):
    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = N
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=[0.3, 0.18055])
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_parameters(CSTR_P)
    nmpc.setup(options={"dt": 0.1})
    return nmpc


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("dp",)

    def test_make_mesh_too_many_raises(self):
        with pytest.raises(ValueError):
            make_mesh(n_devices=10 ** 6)

    def test_shard_batch_places_on_axis(self):
        mesh = make_mesh(8)
        x = shard_batch(jnp.zeros((16, 4)), mesh)
        assert len(x.sharding.device_set) == 8

    def test_replicate(self):
        mesh = make_mesh(8)
        x = replicate(jnp.zeros((4, 4)), mesh)
        assert len(x.sharding.device_set) == 8


class TestShardedSolve:
    def test_sharded_matches_single_device(self):
        nmpc = make_nmpc()
        rng = np.random.default_rng(0)
        B = 16
        x0s = np.array([0.2, 0.1]) + 0.04 * rng.standard_normal((B, 2))
        args = nmpc.prepare_batch(x0s)

        mesh = make_mesh(8)
        fn = sharded_solve_fn(nmpc, mesh)
        sol_sharded = fn(*shard_batch(args, mesh))

        u_single, sol_single = nmpc.optimize_batch(x0s)
        np.testing.assert_allclose(np.asarray(sol_sharded.U),
                                   np.asarray(sol_single.U), atol=1e-8)
        stats = convergence_stats(sol_sharded)
        assert stats["rate"] == 1.0

    def test_dryrun_multichip_entrypoint(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestFusedClosedLoop:
    def test_fused_loop_tracks_and_converges(self):
        from hilo_mpc_tpu.parallel import fused_closed_loop_fn

        P = [1.0] * 6
        plant = cstr_schaffner_and_zeitz()
        plant.setup(dt=0.1, integration_method="rk4")
        nmpc = make_nmpc(N=8)
        run = fused_closed_loop_fn(nmpc, plant, steps=15, plant_p=np.array(P))
        rng = np.random.default_rng(0)
        x0s = np.array([0.2, 0.1]) + 0.04 * rng.standard_normal((6, 2))
        res = run(x0s)
        X = np.asarray(res.X)
        assert X.shape == (6, 16, 2)
        err = np.linalg.norm(X[:, -1, :] - [0.3, 0.18055], axis=1)
        assert err.max() < 3e-2
        assert float(np.asarray(res.converged).mean()) > 0.95

    def test_fused_loop_with_ekf_feedback(self):
        # SURVEY §3.3 with an observer: controller solve + plant step +
        # noisy measurement + EKF predict/update fused in one scan body;
        # the controller only sees the estimate
        import jax

        from hilo_mpc_tpu.estimation import ExtendedKalmanFilter
        from hilo_mpc_tpu.parallel import fused_closed_loop_ekf_fn

        P = [1.0] * 6
        plant = cstr_schaffner_and_zeitz()
        plant.setup(dt=0.1, integration_method="rk4")
        nmpc = make_nmpc(N=8)
        ekf = ExtendedKalmanFilter(cstr_schaffner_and_zeitz())
        ekf.Q = 1e-4 * np.eye(2)
        ekf.R = np.array([[1e-4]])   # the CSTR measures x_2 only
        ekf.set_initial_parameter_values(P)
        ekf.setup(dt=0.1)
        run = fused_closed_loop_ekf_fn(
            nmpc, plant, ekf, steps=20, plant_p=np.array(P),
            meas_noise_std=np.array([0.005]))
        rng = np.random.default_rng(1)
        B = 5
        x0_true = np.array([0.2, 0.1]) + 0.03 * rng.standard_normal((B, 2))
        x_est0 = x0_true + 0.02 * rng.standard_normal((B, 2))  # biased start
        res = run(x0_true, x_est0, 0.05 * np.eye(2),
                  key=jax.random.PRNGKey(0))
        X, Xe = np.asarray(res.X), np.asarray(res.X_est)
        assert X.shape == (B, 21, 2) and Xe.shape == (B, 20, 2)
        # the true closed loop converges to the setpoint through the observer
        err = np.linalg.norm(X[:, -1, :] - [0.3, 0.18055], axis=1)
        assert err.max() < 3e-2
        # the EKF tracks the true state
        est_err = np.abs(Xe[:, -1, :] - X[:, -1, :]).max()
        assert est_err < 2e-2
        assert float(np.asarray(res.converged).mean()) > 0.95

    def test_fused_loop_with_ukf_feedback(self):
        # the fused observer loop takes any filter with the pure step_fn
        # contract (x, P, u, p, y, t) -> (x+, P+, y_pred): UKF drops in
        import jax

        from hilo_mpc_tpu.estimation import UnscentedKalmanFilter
        from hilo_mpc_tpu.parallel import fused_closed_loop_ekf_fn

        P = [1.0] * 6
        plant = cstr_schaffner_and_zeitz()
        plant.setup(dt=0.1, integration_method="rk4")
        nmpc = make_nmpc(N=8)
        ukf = UnscentedKalmanFilter(cstr_schaffner_and_zeitz())
        ukf.Q = 1e-4 * np.eye(2)
        ukf.R = np.array([[1e-4]])
        ukf.set_initial_parameter_values(P)
        ukf.setup(dt=0.1)
        run = fused_closed_loop_ekf_fn(
            nmpc, plant, ukf, steps=15, plant_p=np.array(P),
            meas_noise_std=np.array([0.003]))
        rng = np.random.default_rng(3)
        B = 3
        x0 = np.array([0.2, 0.1]) + 0.02 * rng.standard_normal((B, 2))
        res = run(x0, x0 + 0.01, 0.05 * np.eye(2), key=jax.random.PRNGKey(1))
        X = np.asarray(res.X)
        err = np.linalg.norm(X[:, -1, :] - [0.3, 0.18055], axis=1)
        assert err.max() < 5e-2
        assert float(np.asarray(res.converged).mean()) > 0.95

    def test_fused_loop_with_mhe_feedback(self):
        # MHE observer fused into the loop: controller solve + plant step +
        # measurement + window-NLP solve per scan step (two IP solves/step)
        import jax

        from hilo_mpc_tpu.estimation.mhe import MovingHorizonEstimator
        from hilo_mpc_tpu.parallel import fused_closed_loop_mhe_fn

        P = [1.0] * 6
        plant = cstr_schaffner_and_zeitz()
        plant.setup(dt=0.1, integration_method="rk4")
        nmpc = make_nmpc(N=8)
        mhe = MovingHorizonEstimator(cstr_schaffner_and_zeitz())
        mhe.horizon = 6
        mhe.Q, mhe.R = 1e-2 * np.eye(2), np.array([[1e-2]])
        mhe.P0 = 0.1 * np.eye(2)
        mhe.set_initial_parameter_values(P)
        mhe.setup(dt=0.1, options={"tol": 1e-6, "max_iter": 25})
        run = fused_closed_loop_mhe_fn(
            nmpc, plant, mhe, steps=15, plant_p=np.array(P),
            meas_noise_std=np.array([0.002]))
        # pre-fill the measurement window from a short true rollout
        B, Nw = 4, 6
        rng = np.random.default_rng(2)
        x0 = np.array([0.2, 0.1]) + 0.02 * rng.standard_normal((B, 2))
        Ys = np.zeros((B, Nw + 1, 1))
        Us = np.zeros((B, Nw + 1, 1))
        Xk = x0.copy()
        for k in range(Nw + 1):
            Ys[:, k, 0] = Xk[:, 1] + 0.002 * rng.standard_normal(B)
            if k < Nw:
                out = plant.simulate(x0=Xk, u=np.zeros((1, 1)), p=P, steps=1)
                Xk = np.asarray(out["x"])[:, -1, :]
        res = run(Xk, Ys, Us, x0, key=jax.random.PRNGKey(0))
        X, Xe = np.asarray(res.X), np.asarray(res.X_est)
        assert X.shape == (B, 16, 2) and Xe.shape == (B, 15, 2)
        err = np.linalg.norm(X[:, -1, :] - [0.3, 0.18055], axis=1)
        assert err.max() < 5e-2
        est_err = np.abs(Xe[:, -1, :] - X[:, -1, :]).max()
        assert est_err < 3e-2
        assert float(np.asarray(res.converged).mean()) > 0.95
        assert float(np.asarray(res.mhe_converged).mean()) > 0.9

    def test_fused_loop_with_process_noise(self):
        import jax

        from hilo_mpc_tpu.parallel import fused_closed_loop_fn

        P = [1.0] * 6
        plant = cstr_schaffner_and_zeitz()
        plant.setup(dt=0.1, integration_method="rk4")
        nmpc = make_nmpc(N=8)
        run = fused_closed_loop_fn(nmpc, plant, steps=10, plant_p=np.array(P),
                                   process_noise_std=np.array([0.01, 0.01]))
        x0s = np.tile(np.array([0.2, 0.1]), (4, 1))
        res = run(x0s, key=jax.random.PRNGKey(0))
        X = np.asarray(res.X)
        # noise differentiates identical initial conditions
        assert np.std(X[:, -1, 0]) > 1e-4
