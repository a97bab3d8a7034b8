"""Real-time-iteration NMPC (prepare/feedback split).

Beyond the reference: CasADi/IPOPT pays a full NLP solve inside the loop
(reference: hilo_mpc/modules/controller/mpc.py:1778-1787); the RTI mode
solves at the *predicted* state ahead of time and answers the measured
state with the cached first move + first-stage Riccati feedback gain
(projected tangential predictor) — control latency decoupled from solve
latency.
"""
import numpy as np
import pytest

from hilo_mpc_tpu import NMPC
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

P_CSTR = [1.0] * 6
X_EQ = [0.3, 0.18055]
U_EQ = -0.1194


def _nmpc(N=8, **opts):
    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = N
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=X_EQ)
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_parameters(P_CSTR)
    nmpc.setup(options={"dt": 0.1, **opts})
    return nmpc


def _plant():
    plant = cstr_schaffner_and_zeitz()
    plant.setup(dt=0.1, integration_method="rk4")
    plant.set_initial_conditions([0.2, 0.1])
    plant.set_initial_parameter_values(P_CSTR)
    return plant


def _du_nmpc(N=8, du_weight=0.5, **opts):
    # Δu-augmented formulation: input-increment penalty (the common
    # industrial cost, reference: util/modeling.py:89-531 Δu terms)
    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = N
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=X_EQ)
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.quad_stage_cost.add_inputs_change(weights=du_weight)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_parameters(P_CSTR)
    nmpc.setup(options={"dt": 0.1, **opts})
    assert nmpc._augment_du
    return nmpc


class TestDuRTI:
    def test_du_rti_tracks_like_full_solve(self):
        # full-solve Δu loop
        plant = _plant()
        full = _du_nmpc()
        x = np.array([0.2, 0.1])
        xs_full = [x]
        for _ in range(30):
            u = full.optimize(x)
            x = plant.simulate(u=u, steps=1)["x"][-1]
            xs_full.append(x)
        # Δu RTI loop
        plant = _plant()
        rti = _du_nmpc()
        x = np.array([0.2, 0.1])
        rti.rti_prepare(x_pred=x)
        xs_rti = [x]
        for _ in range(30):
            u = rti.rti_feedback(x)
            x = plant.simulate(u=u, steps=1)["x"][-1]
            xs_rti.append(x)
            rti.rti_prepare()
        xs_full, xs_rti = np.array(xs_full), np.array(xs_rti)
        assert np.linalg.norm(xs_rti[-1] - X_EQ) < 1e-2
        assert np.max(np.abs(xs_rti - xs_full)) < 2e-2

    def test_du_feedback_respects_both_bound_sets(self):
        # tight Δu bounds: the tangential predictor must clip Δu AND u
        nmpc = NMPC(cstr_schaffner_and_zeitz())
        nmpc.horizon = 6
        nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=X_EQ)
        nmpc.quad_stage_cost.add_inputs_change(weights=0.05)
        nmpc.set_box_constraints(u_lb=[-0.5], u_ub=[0.5],
                                 du_lb=[-0.1], du_ub=[0.1])
        nmpc.set_parameters(P_CSTR)
        nmpc.setup(options={"dt": 0.1})
        nmpc.rti_prepare(x_pred=[0.25, 0.12])
        u_prev = nmpc._u_old.copy()
        u = nmpc.rti_feedback(np.array([0.25, 0.12]) + 5.0)  # huge deviation
        assert abs(u[0] - u_prev[0]) <= 0.1 + 1e-10
        assert -0.5 - 1e-10 <= u[0] <= 0.5 + 1e-10

    def test_du_prediction_exposes_u(self):
        rti = _du_nmpc()
        rti.rti_prepare(x_pred=[0.2, 0.1])
        pred = rti.last_prediction
        assert pred["u"].shape == (8, 1)
        assert np.all(np.abs(pred["u"]) <= 5.0 + 1e-9)


class TestSingleIterationRTI:
    def test_gn_prepare_runs_one_iteration(self):
        rti = _nmpc()
        rti.rti_gn_iterations = 1
        rti.rti_prepare(x_pred=[0.2, 0.1])
        st = rti._rti["stats"]
        assert st["mode"] == "rti-gn"
        assert st["iterations"] == 1

    def test_gn_loop_matches_full_prepare_loop(self):
        # closed-loop accuracy: 1-GN-iteration prepare vs full-solve prepare
        def run(gn):
            plant = _plant()
            rti = _nmpc()
            if gn:
                rti.rti_gn_iterations = 1
            x = np.array([0.2, 0.1])
            rti.rti_prepare(x_pred=x)
            xs = [x]
            for _ in range(30):
                u = rti.rti_feedback(x)
                x = plant.simulate(u=u, steps=1)["x"][-1]
                xs.append(x)
                rti.rti_prepare()
            return np.array(xs)

        xs_full = run(gn=False)
        xs_gn = run(gn=True)
        assert np.linalg.norm(xs_gn[-1] - X_EQ) < 1e-2
        # single-GN trajectories track the converged-solve trajectories
        assert np.max(np.abs(xs_gn - xs_full)) < 3e-2

    def test_gn_works_with_du(self):
        plant = _plant()
        rti = _du_nmpc()
        rti.rti_gn_iterations = 1
        x = np.array([0.2, 0.1])
        rti.rti_prepare(x_pred=x)
        for _ in range(30):
            u = rti.rti_feedback(x)
            x = plant.simulate(u=u, steps=1)["x"][-1]
            rti.rti_prepare()
        assert np.linalg.norm(x - X_EQ) < 1e-2


class TestRTIClosedLoop:
    def test_rti_tracks_setpoint_like_full_solve(self):
        # full-solve loop
        plant = _plant()
        nmpc = _nmpc()
        x = np.array([0.2, 0.1])
        xs_full = [x]
        for _ in range(25):
            u = nmpc.optimize(x)
            x = plant.simulate(u=u, steps=1)["x"][-1]
            xs_full.append(x)
        # RTI loop: first prepare at the measured state, then predict-ahead
        plant = _plant()
        rti = _nmpc()
        x = np.array([0.2, 0.1])
        rti.rti_prepare(x_pred=x)
        xs_rti = [x]
        fb_times = []
        for _ in range(25):
            u = rti.rti_feedback(x)
            fb_times.append(rti.stats["t_feedback"])
            x = plant.simulate(u=u, steps=1)["x"][-1]
            xs_rti.append(x)
            rti.rti_prepare()          # solve ahead at the predicted state
        xs_full, xs_rti = np.array(xs_full), np.array(xs_rti)
        # both loops reach the equilibrium
        assert np.linalg.norm(xs_full[-1] - X_EQ) < 5e-3
        assert np.linalg.norm(xs_rti[-1] - X_EQ) < 5e-3
        # RTI trajectory stays close to the optimal closed loop throughout
        assert np.max(np.abs(xs_rti - xs_full)) < 2e-2
        # feedback phase is solver-free: orders of magnitude under a solve
        assert np.median(fb_times) < 0.05
        assert rti.stats["phase"] == "rti"

    def test_feedback_is_linear_in_state_deviation(self):
        rti = _nmpc()
        x = np.array([0.25, 0.12])
        rti.rti_prepare(x_pred=x)
        K0 = rti._rti["K0"].copy()
        U0 = rti._rti["U"][0].copy()
        dx = np.array([1e-3, -2e-3])
        u = rti.rti_feedback(x + dx)
        # u = u* + K0 δx (in scaled coordinates; scalings are 1 here)
        expected = U0 + K0 @ dx
        np.testing.assert_allclose(u, expected * rti._u_scaling[0], atol=1e-12)

    def test_feedback_respects_input_bounds(self):
        rti = _nmpc()
        x = np.array([0.25, 0.12])
        rti.rti_prepare(x_pred=x)
        u = rti.rti_feedback(x + np.array([5.0, -5.0]))  # huge deviation
        assert -5.0 - 1e-12 <= u[0] <= 5.0 + 1e-12

    def test_prepare_consumes_feedback_once(self):
        rti = _nmpc()
        rti.rti_prepare(x_pred=[0.25, 0.12])
        rti.rti_feedback([0.25, 0.12])
        with pytest.raises(RuntimeError, match="rti_prepare"):
            rti.rti_feedback([0.25, 0.12])


class TestGainIsSolutionSensitivity:
    def test_K0_matches_finite_difference_du_dx0(self):
        # away from active constraints, the exact-Hessian gain would equal
        # ∂u0*/∂x0 of the full NLP; ours is the Gauss-Newton gain (cost
        # curvature only, no λᵀ∇²f term), so the dominant entry matches to
        # ~1e-3 relative and the whole row to the GN approximation error
        nmpc = _nmpc(N=10, tol=1e-9, max_iter=60)
        x = np.array([0.27, 0.15])
        nmpc.rti_prepare(x_pred=x)
        K0 = nmpc._rti["K0"].copy()
        h = 1e-5
        fd = np.zeros((1, 2))
        for j in range(2):
            e = np.zeros(2)
            e[j] = h
            up = _nmpc(N=10, tol=1e-9, max_iter=60).optimize(x + e)
            um = _nmpc(N=10, tol=1e-9, max_iter=60).optimize(x - e)
            fd[:, j] = (up - um) / (2 * h)
        j_dom = int(np.argmax(np.abs(fd[0])))
        np.testing.assert_allclose(K0[0, j_dom], fd[0, j_dom], rtol=1e-2)
        np.testing.assert_allclose(K0, fd, atol=2e-2)


class TestBatchedRTI:
    def test_batched_feedback_matches_scalar_rti(self):
        B = 6
        rng = np.random.default_rng(0)
        x_pred = np.array([0.25, 0.12]) + 0.02 * rng.standard_normal((B, 2))
        dx = 1e-3 * rng.standard_normal((B, 2))

        batched = _nmpc()
        batched.rti_prepare_batch(x_pred)
        U0 = batched.rti_feedback_batch(x_pred + dx)
        assert U0.shape == (B, 1)

        # scalar RTI on each scenario gives the same moves (the batched path
        # is the same solver + gain, vmapped)
        for i in range(B):
            scalar = _nmpc()
            scalar.rti_prepare(x_pred=x_pred[i])
            u_i = scalar.rti_feedback(x_pred[i] + dx[i])
            np.testing.assert_allclose(U0[i], u_i, atol=1e-6)

    def test_warm_batched_rti_fleet_loop(self):
        # a fleet of closed loops driven by warm batched RTI converges to the
        # equilibrium from every start
        B = 8
        rng = np.random.default_rng(2)
        nmpc = _nmpc()
        X = np.array([0.2, 0.1]) + 0.03 * rng.standard_normal((B, 2))
        nmpc.rti_prepare_batch(X)
        plant = _plant()  # batched stateless rollouts via simulate(x0=...)
        for k in range(25):
            U = nmpc.rti_feedback_batch(X)
            out = plant.simulate(x0=X, u=U[:, None, :], p=P_CSTR, steps=1)
            X = np.asarray(out["x"])[:, -1, :]
            nmpc.rti_prepare_batch(X, warm=True)
        assert np.max(np.linalg.norm(X - X_EQ, axis=1)) < 1e-2

    def test_du_batched_feedback_matches_scalar(self):
        # Δu-augmented fleet RTI: per-scenario u_prev rides in the augmented
        # state; the batched moves equal the scalar Δu RTI per scenario
        B = 4
        rng = np.random.default_rng(3)
        x_pred = np.array([0.25, 0.12]) + 0.02 * rng.standard_normal((B, 2))
        dx = 1e-3 * rng.standard_normal((B, 2))
        u_prev = 0.05 * rng.standard_normal((B, 1))

        batched = _du_nmpc()
        batched.rti_prepare_batch(x_pred, u_prev=u_prev)
        U0 = batched.rti_feedback_batch(x_pred + dx)
        assert U0.shape == (B, 1)

        for i in range(B):
            scalar = _du_nmpc()
            scalar._u_old = u_prev[i].copy()
            scalar.rti_prepare(x_pred=x_pred[i])
            u_i = scalar.rti_feedback(x_pred[i] + dx[i])
            np.testing.assert_allclose(U0[i], u_i, atol=1e-6)

    def test_du_fleet_loop_with_active_du_bounds(self):
        # fleet closed loop under Δu costs AND active Δu bounds: the applied
        # input increments never exceed the bound and every start converges
        B = 6
        du_max = 0.04
        rng = np.random.default_rng(4)
        nmpc = _du_nmpc()
        nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0],
                                 du_lb=[-du_max], du_ub=[du_max])
        nmpc.setup(options={"dt": 0.1})
        X = np.array([0.2, 0.1]) + 0.03 * rng.standard_normal((B, 2))
        plant = _plant()
        nmpc.rti_prepare_batch(X)
        U_hist = []
        for k in range(40):
            U = nmpc.rti_feedback_batch(X)
            U_hist.append(U.copy())
            out = plant.simulate(x0=X, u=U[:, None, :], p=P_CSTR, steps=1)
            X = np.asarray(out["x"])[:, -1, :]
            nmpc.rti_prepare_batch(X, warm=True)
        U_hist = np.asarray(U_hist)              # (T, B, 1)
        dU = np.diff(U_hist, axis=0)
        assert np.max(np.abs(dU)) <= du_max + 1e-9
        assert np.max(np.linalg.norm(X - X_EQ, axis=1)) < 2e-2

    def test_batched_feedback_clips_bounds(self):
        batched = _nmpc()
        x_pred = np.tile([0.25, 0.12], (3, 1))
        batched.rti_prepare_batch(x_pred)
        U0 = batched.rti_feedback_batch(x_pred + 10.0)
        assert np.all(U0 >= -5.0 - 1e-12) and np.all(U0 <= 5.0 + 1e-12)

    def test_batched_feedback_requires_prepare(self):
        nmpc = _nmpc()
        with pytest.raises(RuntimeError, match="rti_prepare_batch"):
            nmpc.rti_feedback_batch(np.zeros((2, 2)))

    def test_batch_size_mismatch(self):
        nmpc = _nmpc()
        nmpc.rti_prepare_batch(np.tile([0.25, 0.12], (3, 1)))
        with pytest.raises(ValueError, match="scenarios"):
            nmpc.rti_feedback_batch(np.zeros((2, 2)))


class TestRTIValidation:
    def test_first_prepare_needs_x_pred(self):
        rti = _nmpc()
        with pytest.raises(RuntimeError, match="x_pred"):
            rti.rti_prepare()

    def test_prepare_before_setup(self):
        nmpc = NMPC(cstr_schaffner_and_zeitz())
        nmpc.horizon = 5
        with pytest.raises(RuntimeError, match="setup"):
            nmpc.rti_prepare(x_pred=[0.2, 0.1])

    def test_wrong_x_pred_size(self):
        rti = _nmpc()
        with pytest.raises(ValueError, match="entries"):
            rti.rti_prepare(x_pred=[0.2, 0.1, 0.3])

    def test_wrong_feedback_size(self):
        rti = _nmpc()
        rti.rti_prepare(x_pred=[0.2, 0.1])
        with pytest.raises(ValueError, match="entries"):
            rti.rti_feedback([0.2])

    def test_path_following_batched_rejected(self):
        nmpc = NMPC(cstr_schaffner_and_zeitz())
        nmpc.horizon = 5
        nmpc.create_path_variable()
        nmpc.quad_stage_cost.add_states(
            weights=[10.0, 10.0], path_following=True,
            path_fn=lambda th: np.asarray(X_EQ))
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.set_parameters(P_CSTR)
        nmpc.setup(options={"dt": 0.1})
        with pytest.raises(NotImplementedError, match="batched RTI"):
            nmpc.rti_prepare_batch(np.tile([0.2, 0.1], (3, 1)))

    def test_control_loop_rti_mode(self):
        from hilo_mpc_tpu import SimpleControlLoop

        plant = _plant()
        loop = SimpleControlLoop(plant, _nmpc())
        sol = loop.run(20, rti=True)
        assert sol.n_samples == 20
        x_fin = np.asarray(sol["x:f"]).ravel()
        assert np.linalg.norm(x_fin - X_EQ) < 1e-2

    def test_control_loop_rti_with_observer(self):
        from hilo_mpc_tpu import ExtendedKalmanFilter, SimpleControlLoop

        plant = _plant()
        ekf_model = cstr_schaffner_and_zeitz()
        ekf_model.setup(dt=0.1, integration_method="rk4")
        kf = ExtendedKalmanFilter(ekf_model)
        kf.setup()
        kf.set_initial_guess([0.2, 0.1])
        kf.set_initial_parameter_values(P_CSTR)
        loop = SimpleControlLoop(plant, _nmpc(), kf)
        sol = loop.run(15, rti=True)
        x_fin = np.asarray(sol["x:f"]).ravel()
        assert np.linalg.norm(x_fin - X_EQ) < 2e-2

    def test_control_loop_rti_needs_capable_controller(self):
        from hilo_mpc_tpu import SimpleControlLoop

        plant = _plant()
        loop = SimpleControlLoop(plant, lambda x: np.zeros(1))
        with pytest.raises(TypeError, match="rti"):
            loop.run(2, rti=True)

    def test_solution_series_records_rti_steps(self):
        rti = _nmpc()
        rti.rti_prepare(x_pred=[0.2, 0.1])
        rti.rti_feedback([0.2, 0.1])
        assert rti.solution.n_samples == 1
        stats = np.asarray(rti.solution["stats"])
        assert stats.shape[1] == 1  # one recorded step
