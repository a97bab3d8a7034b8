"""Learned-MPC flow (reference example family: learned MPC — distill an NMPC policy
into an ANN and run it as the controller) + LQR cross-validation vs scipy."""
import numpy as np
import pytest

from hilo_mpc_tpu import ANN, LQR, NMPC, Dense, Model, SimpleControlLoop
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

CSTR_P = [1.0] * 6
EQ = [0.3, 0.18055]


class TestPolicyDistillation:
    def test_ann_imitates_nmpc_policy(self):
        # teacher: NMPC; students: ANN trained on (x -> u) pairs from batched solves
        nmpc = NMPC(cstr_schaffner_and_zeitz())
        nmpc.horizon = 10
        nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=EQ)
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
        nmpc.set_parameters(CSTR_P)
        nmpc.setup(options={"dt": 0.1})

        rng = np.random.default_rng(0)
        X_train = np.array(EQ) + rng.uniform(-0.15, 0.15, size=(256, 2))
        U_train, sol = nmpc.optimize_batch(X_train)
        assert float(np.asarray(sol.converged).mean()) > 0.98

        ann = ANN(["x_1", "x_2"], ["u"])
        ann.add_layers([Dense(32, activation="tanh"),
                        Dense(32, activation="tanh")])
        ann.train(batch_size=64, epochs=400, X=X_train, y=U_train, patience=150)

        # student matches teacher on held-out states
        X_test = np.array(EQ) + rng.uniform(-0.1, 0.1, size=(16, 2))
        U_teacher, _ = nmpc.optimize_batch(X_test)
        U_student = ann.predict(X_test)
        assert np.median(np.abs(U_student - U_teacher)) < 0.05

        # student closes the loop at MPC-like quality but one forward pass per step
        plant = cstr_schaffner_and_zeitz()
        plant.setup(dt=0.1, integration_method="rk4")
        plant.set_initial_conditions([0.25, 0.12])
        plant.set_initial_parameter_values(CSTR_P)
        loop = SimpleControlLoop(plant, lambda x: ann.predict(x[None, :])[0])
        loop.run(40)
        x_final = plant.solution["x:f"]
        assert np.linalg.norm(x_final - EQ) < 0.02


class TestLQRCrossValidation:
    def test_infinite_horizon_matches_scipy_dare(self):
        from scipy.linalg import solve_discrete_are

        dt = 0.1
        A = np.array([[1.0, dt], [0.0, 1.0]])
        B = np.array([[0.5 * dt ** 2], [dt]])
        Q = np.diag([3.0, 1.0])
        R = np.array([[0.4]])
        m = Model(discrete=True)
        m.set_state_space(A=A, B=B)
        lqr = LQR(m)
        lqr.horizon = None
        lqr.Q = Q
        lqr.R = R
        lqr.setup()
        P_ref = solve_discrete_are(A, B, Q, R)
        K_ref = np.linalg.solve(R + B.T @ P_ref @ B, B.T @ P_ref @ A)
        np.testing.assert_allclose(lqr.K, K_ref, atol=1e-6)
        np.testing.assert_allclose(lqr._P, P_ref, atol=1e-5)

    def test_finite_horizon_approaches_infinite(self):
        dt = 0.1
        m = Model(discrete=True)
        m.set_state_space(A=[[1.0, dt], [0.0, 1.0]], B=[[0.5 * dt ** 2], [dt]])

        def gain(N):
            lqr = LQR(m)
            lqr.horizon = N
            lqr.Q = np.eye(2)
            lqr.R = np.eye(1) * 0.5
            lqr.setup()
            return lqr.K

        lqr_inf = LQR(m)
        lqr_inf.horizon = None
        lqr_inf.Q = np.eye(2)
        lqr_inf.R = np.eye(1) * 0.5
        lqr_inf.setup()
        d_short = np.max(np.abs(gain(5) - lqr_inf.K))
        d_long = np.max(np.abs(gain(200) - lqr_inf.K))
        assert d_long < d_short
        assert d_long < 1e-6
