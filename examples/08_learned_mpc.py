"""Learned MPC: distill an NMPC policy into an ANN, then run the network as the
controller (reference example: docs/examples learn_mpc.ipynb — there the data come
from closed-loop runs and the torch-trained net is rebuilt as a CasADi graph; here
the teacher generates the dataset as ONE batched solve and the natively-trained
network is already a traceable JAX function).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import numpy as np

from hilo_mpc_tpu import ANN, NMPC, Dense, SimpleControlLoop
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

P = [1.0] * 6
SETPOINT = [0.3, 0.18055]

# --- teacher: reference-tracking NMPC --------------------------------------
teacher = NMPC(cstr_schaffner_and_zeitz())
teacher.horizon = 10
teacher.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=SETPOINT)
teacher.quad_stage_cost.add_inputs(weights=0.1)
teacher.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
teacher.set_parameters(P)
teacher.setup(options={"dt": 0.1})

# --- dataset: one batched solve over sampled states ------------------------
rng = np.random.default_rng(0)
X_train = np.array(SETPOINT) + rng.uniform(-0.15, 0.15, size=(512, 2))
U_train, sol = teacher.optimize_batch(X_train)
print(f"teacher dataset: {len(X_train)} states, "
      f"{float(np.asarray(sol.converged).mean()) * 100:.1f}% converged")

# --- student: small MLP policy ---------------------------------------------
policy = ANN(["x_1", "x_2"], ["u"])
policy.add_layers([Dense(32, activation="tanh"), Dense(32, activation="tanh")])
policy.train(batch_size=64, epochs=400, X=X_train, y=U_train, patience=150)

X_test = np.array(SETPOINT) + rng.uniform(-0.1, 0.1, size=(32, 2))
U_teacher, _ = teacher.optimize_batch(X_test)
err = np.median(np.abs(policy.predict(X_test) - U_teacher))
print(f"imitation error (median |u_ann - u_nmpc|): {err:.3f}")

# --- closed loop: one forward pass per step instead of an NLP solve --------
plant = cstr_schaffner_and_zeitz()
plant.setup(dt=0.1, integration_method="rk4")
plant.set_initial_conditions([0.25, 0.12])
plant.set_initial_parameter_values(P)
loop = SimpleControlLoop(plant, policy)
loop.run(40)
x_final = plant.solution["x:f"]
print(f"ANN-controlled loop: x_final={x_final}, tracking error "
      f"{np.linalg.norm(x_final - SETPOINT):.2e}")
