"""Golden-parity configurations — shared by the fixture generator
(tools/make_golden_fixtures.py, tools/make_golden_ipopt.py) and the parity test
(tests/test_golden_parity.py), so both sides construct the *identical*
controller/estimator.

One builder per BASELINE.json config:
  cstr_tracking   — configs[0]: reference-tracking NMPC, CSTR, N=20, rk4
  lmpc_di         — configs[1]: LMPC condensed-QP path on a discrete linear model
  mhe_cstr        — configs[2]: MHE window estimation for the CSTR
  pathfollow_soft — configs[3]: path-following NMPC + soft constraint band
  hybrid_ann      — configs[4]: NMPC over hybrid physics+ANN dynamics

All run at x64 with tight solver tolerances; the throughput bench config
(f32, tol=1e-4) is a different operating point by design.
"""
import numpy as np

CSTR_P = [1.0] * 6  # a_1, b_1, a_2, b_2, g, E
CSTR_REF = [0.3, 0.18055]


# -- independent plant steppers (pure numpy; no framework code) ---------------

def cstr_ode_np(x, u, p=CSTR_P):
    """Schaffner & Zeitz CSTR ODE, written out independently
    (reference: hilo_mpc/library/models.py:30-56)."""
    a1, b1, a2, b2, g, E = p
    r = (1.0 - x[0]) * np.exp(-E / (1.0 + x[1]))
    return np.array([-a1 * x[0] + b1 * r,
                     -a2 * x[1] + b2 * r + g * u[0]])


def rk4_np(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


# -- configs[0]: CSTR reference-tracking NMPC ---------------------------------

def build_cstr_tracking():
    from hilo_mpc_tpu import NMPC
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = 20
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=CSTR_REF)
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_parameters(CSTR_P)
    nmpc.setup(options={"dt": 0.1, "integration_method": "rk4",
                        "tol": 1e-9, "max_iter": 80})
    scenario = {
        "x0": np.array([0.2, 0.1]),
        "steps": 25,
        "plant_step": lambda x, u: rk4_np(cstr_ode_np, x, u, 0.1),
    }
    return nmpc, scenario


# -- configs[1]: LMPC on a discrete-time double integrator --------------------

LMPC_DT = 0.1
LMPC_A = np.array([[1.0, LMPC_DT], [0.0, 1.0]])
LMPC_B = np.array([[0.5 * LMPC_DT ** 2], [LMPC_DT]])


def build_lmpc_di():
    from hilo_mpc_tpu import LMPC, Model

    m = Model(discrete=True)
    m.set_state_space(A=LMPC_A, B=LMPC_B)
    lmpc = LMPC(m)
    lmpc.horizon = 15
    lmpc.Q = np.diag([2.0, 0.5])
    lmpc.R = np.array([[0.1]])
    lmpc.P = np.diag([8.0, 2.0])
    lmpc.set_box_constraints(u_lb=[-0.8], u_ub=[0.8],
                             x_lb=[-np.inf, -0.6], x_ub=[np.inf, 0.6])
    lmpc.setup(options={"dt": LMPC_DT, "tol": 1e-9, "max_iter": 80})
    scenario = {
        "x0": np.array([1.5, 0.0]),
        "steps": 25,
        "plant_step": lambda x, u: LMPC_A @ x + LMPC_B @ u,
    }
    return lmpc, scenario


# -- configs[2]: MHE window estimation for the CSTR ---------------------------

def build_mhe_cstr():
    from hilo_mpc_tpu.estimation.mhe import MovingHorizonEstimator
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

    mhe = MovingHorizonEstimator(cstr_schaffner_and_zeitz())
    mhe.horizon = 8
    mhe.Q = 1e-3 * np.eye(2)      # process-noise covariance -> W_noise = Q^-1
    mhe.R = np.array([[1e-4]])    # measurement covariance -> W_meas = R^-1
    mhe.P0 = 0.05 * np.eye(2)     # arrival covariance
    mhe.set_initial_parameter_values(CSTR_P)
    mhe.setup(dt=0.1, options={"integration_method": "rk4",
                               "tol": 1e-9, "max_iter": 80})
    mhe.set_initial_guess([0.25, 0.08])
    scenario = {
        "x0_true": np.array([0.2, 0.1]),
        "steps": 22,
        "meas_std": 0.003,
        "seed": 7,
        "plant_step": lambda x, u: rk4_np(cstr_ode_np, x, u, 0.1),
    }
    return mhe, scenario


# -- configs[3]: path-following NMPC with soft constraint band ----------------

def build_pathfollow_soft():
    import jax.numpy as jnp

    from hilo_mpc_tpu import Model, NMPC

    m = Model(name="pt")
    m.set_dynamical_states(["px", "py"])
    m.set_inputs(["vx", "vy"])
    m.set_dynamical_equations(lambda x, u: u)

    nmpc = NMPC(m)
    nmpc.horizon = 12
    path_fn = lambda th: jnp.stack([th, jnp.sin(th)])
    nmpc.quad_stage_cost.add_states(names=["px", "py"], weights=[20.0, 20.0],
                                    path_following=True, path_fn=path_fn)
    nmpc.quad_stage_cost.add_inputs(weights=[0.05, 0.05])
    nmpc.set_box_constraints(u_lb=[-2.0, -2.0], u_ub=[2.0, 2.0])
    # soft "obstacle band": keep py <= 0.7 softly (quadratic penalty, the
    # reference's soft-constraint semantics)
    nmpc.add_stage_constraint(lambda x, u: jnp.stack([x[1] - 0.7]), ub=0.0,
                              n=1, is_soft=True, weight=50.0)
    nmpc.create_path_variable(u_pf_lb=0.0, u_pf_ub=2.0, speed_ref=1.0,
                              speed_weight=1.0)
    nmpc.setup(options={"dt": 0.1, "tol": 1e-9, "max_iter": 80})
    scenario = {
        "x0": np.array([0.0, 0.0]),
        "steps": 25,
        "plant_step": lambda x, u: x + 0.1 * u,  # exact for kinematic point
    }
    return nmpc, scenario


# -- configs[4]: NMPC over hybrid physics+ANN dynamics ------------------------

def _fixed_ann():
    """Tiny deterministic MLP (no training — weights are a frozen function of a
    seed) predicting the CSTR activation-energy parameter E from the states."""
    from hilo_mpc_tpu import ANN, Dense

    ann = ANN(["x_1", "x_2"], ["E"])
    ann.add_layers([Dense(8, activation="tanh")])
    ann.setup(normalize=False)
    rng = np.random.default_rng(42)
    params = []
    for layer in ann._params:
        W = 0.3 * rng.standard_normal(layer["W"].shape)
        b = 0.1 * rng.standard_normal(layer["b"].shape)
        params.append({"W": W, "b": b})
    # shift the output bias so predicted E stays near the nominal 1.0
    params[-1]["b"] = params[-1]["b"] + 1.0
    ann._params = [{"W": np.asarray(p["W"]), "b": np.asarray(p["b"])}
                   for p in params]
    return ann


def build_hybrid_ann():
    from hilo_mpc_tpu import NMPC
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz
    from hilo_mpc_tpu.ml.hybrid import substitute_from

    ann = _fixed_ann()
    model = cstr_schaffner_and_zeitz()
    substitute_from(model, ann)

    nmpc = NMPC(model)
    nmpc.horizon = 15
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=CSTR_REF)
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_parameters(CSTR_P[:5])  # E replaced by the ANN
    nmpc.setup(options={"dt": 0.1, "integration_method": "rk4",
                        "tol": 1e-9, "max_iter": 80})

    # independent numpy twin of the hybrid dynamics for the plant
    def ann_E_np(x):
        # ANN._apply convention: h @ W + b, W shape (in, out) (ml/nn.py:157)
        h = x
        for layer in ann._params[:-1]:
            h = np.tanh(h @ np.asarray(layer["W"]) + np.asarray(layer["b"]))
        out = ann._params[-1]
        return float(h @ np.asarray(out["W"]) + np.asarray(out["b"]))

    def hybrid_ode_np(x, u):
        p = list(CSTR_P)
        p[5] = ann_E_np(x)
        return cstr_ode_np(x, u, p)

    scenario = {
        "x0": np.array([0.2, 0.1]),
        "steps": 25,
        "plant_step": lambda x, u: rk4_np(hybrid_ode_np, x, u, 0.1),
    }
    return nmpc, scenario


# -- configs[5]: soft-constraint-ACTIVE tracking ------------------------------
# the setpoint sits above the soft state bound, so the relu^2 penalty is active
# along the whole steady state — pins the soft-constraint path to the oracle

def build_softcon_active():
    from hilo_mpc_tpu import NMPC
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = 15
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=CSTR_REF)
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0],
                             x_ub=[0.27, np.inf], x_soft=True,
                             soft_weight=500.0)
    nmpc.set_parameters(CSTR_P)
    nmpc.setup(options={"dt": 0.1, "integration_method": "rk4",
                        "tol": 1e-9, "max_iter": 80})
    scenario = {
        "x0": np.array([0.2, 0.1]),
        "steps": 25,
        "plant_step": lambda x, u: rk4_np(cstr_ode_np, x, u, 0.1),
    }
    return nmpc, scenario


# -- configs[6]: minimum-time NMPC --------------------------------------------
# rest-to-rest double-integrator transfer; solved from a sequence of initial
# states (min-time is an open-loop planning problem: x_seq replaces the
# closed-loop plant rollout; the parity test replays X_meas either way)

def build_mintime():
    import jax.numpy as jnp

    from hilo_mpc_tpu import Model, NMPC

    m = Model(name="di")
    m.set_dynamical_states(["p", "v"])
    m.set_inputs("a")
    m.set_dynamical_equations(lambda x, u: jnp.stack([x[1], u[0]]))

    nmpc = NMPC(m)
    nmpc.horizon = 16
    nmpc.set_box_constraints(u_lb=-1.0, u_ub=1.0)
    nmpc.add_terminal_constraint(lambda x: x, lb=[0.0, 0.0], ub=[0.0, 0.0],
                                 n=2)
    nmpc.minimize_final_time(weight=1.0, dt_min=0.02, dt_max=0.6)
    nmpc.setup(options={"dt": 0.2, "integration_method": "rk4",
                        "tol": 1e-9, "max_iter": 120})
    rng = np.random.default_rng(11)
    x_seq = np.stack([
        np.array([-1.0, 0.0]) + np.array([0.25, 0.15]) *
        rng.standard_normal(2) for _ in range(22)])
    scenario = {"x0": x_seq[0], "steps": 22, "x_seq": x_seq}
    return nmpc, scenario


# -- configs[7]: DAE model + collocation transcription ------------------------

DAE_ALPHA = 0.05


def dae_z_np(x):
    # algebraic residual 0 = z - 0.5 x - DAE_ALPHA z^2, solvable branch
    return (1.0 - np.sqrt(1.0 - 4.0 * DAE_ALPHA * 0.5 * x)) / (2.0 * DAE_ALPHA)


def dae_ode_np(x, u):
    z = dae_z_np(x[0])
    return np.array([-x[0] + z + u[0]])


def build_dae_colloc():
    import jax.numpy as jnp

    from hilo_mpc_tpu import Model, NMPC

    m = Model(name="dae")
    m.set_dynamical_states("x")
    m.set_algebraic_states("z")
    m.set_inputs("u")
    m.set_dynamical_equations(lambda x, z, u: -x + z + u)
    m.set_algebraic_equations(
        lambda x, z: z - 0.5 * x - DAE_ALPHA * z ** 2)

    nmpc = NMPC(m)
    nmpc.horizon = 12
    nmpc.quad_stage_cost.add_states(weights=[10.0], ref=[0.5])
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-2.0], u_ub=[2.0])
    nmpc.setup(options={"dt": 0.1, "integration_method": "collocation",
                        "degree": 3, "tol": 1e-9, "max_iter": 80})
    scenario = {
        "x0": np.array([0.1]),
        "steps": 25,
        "plant_step": lambda x, u: rk4_np(dae_ode_np, x, u, 0.1),
    }
    return nmpc, scenario


# -- configs[8]: SMPC with an active chance constraint ------------------------

def build_smpc_chance():
    import jax.numpy as jnp

    from hilo_mpc_tpu import GP, Model, SMPC

    m = Model(name="lin")
    m.set_dynamical_states(["x1", "x2"])
    m.set_inputs("u")
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], -0.5 * x[0] - 0.4 * x[1] + u[0]]))

    rng = np.random.default_rng(3)
    X = np.linspace(-1.5, 1.5, 25)[:, None]
    y = 0.05 * np.sin(2 * X[:, 0]) + 0.02 * rng.standard_normal(25)
    gp = GP(["x1"], ["d"], noise_variance=0.02)
    gp.set_training_data(X, y)
    gp.setup()

    smpc = SMPC(m, gps={"x2": gp}, dt=0.1)
    smpc.horizon = 10
    smpc.quad_stage_cost.add_states(names=["x1", "x2"], weights=[5.0, 1.0],
                                    ref=[0.85, 0.0])
    smpc.quad_stage_cost.add_inputs(weights=0.05)
    smpc.set_box_constraints(u_lb=[-2.0], u_ub=[2.0])
    # setpoint close to the chance bound: the erfinv back-off is active
    smpc.set_box_chance_constraints(x_ub=[0.9, np.inf], level=0.95)
    smpc.setup(options={"dt": 0.1, "tol": 1e-9, "max_iter": 80})

    def plant_step(x, u):
        f = lambda xx, uu: np.array(
            [xx[1], -0.5 * xx[0] - 0.4 * xx[1] + uu[0]])
        return rk4_np(f, x, u, 0.1)

    scenario = {
        "x0": np.array([0.3, 0.0]),
        "steps": 25,
        "plant_step": plant_step,
    }
    return smpc, scenario


# -- configs[9]: Δu-augmented tracking ----------------------------------------
# input-increment cost + Δu bounds: the solver state is augmented with u_prev
# and the control variable is Δu — the formulation behind Δu RTI

def build_du_tracking():
    from hilo_mpc_tpu import NMPC
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = 15
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=CSTR_REF)
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.quad_stage_cost.add_inputs_change(weights=0.5)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0],
                             du_lb=[-0.5], du_ub=[0.5])
    nmpc.set_parameters(CSTR_P)
    nmpc.setup(options={"dt": 0.1, "integration_method": "rk4",
                        "tol": 1e-9, "max_iter": 80})
    scenario = {
        "x0": np.array([0.2, 0.1]),
        "steps": 25,
        "plant_step": lambda x, u: rk4_np(cstr_ode_np, x, u, 0.1),
    }
    return nmpc, scenario


CONFIGS = {
    "cstr_tracking": build_cstr_tracking,
    "lmpc_di": build_lmpc_di,
    "mhe_cstr": build_mhe_cstr,
    "pathfollow_soft": build_pathfollow_soft,
    "hybrid_ann": build_hybrid_ann,
    "softcon_active": build_softcon_active,
    "mintime": build_mintime,
    "dae_colloc": build_dae_colloc,
    "smpc_chance": build_smpc_chance,
    "du_tracking": build_du_tracking,
}
