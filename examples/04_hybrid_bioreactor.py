"""Hybrid neural-network dynamics inside NMPC (BASELINE configs[4]; reference
example: hybrid bio NMPC on E. coli, tests/test_hybrid_models_func.py).

A first-principles bioreactor model with an unknown growth-rate parameter gets the
rate substituted by a trained ANN; the hybrid model drives an NMPC."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from hilo_mpc_tpu import ANN, Dense, Model, NMPC


def monod(S):
    return 0.5 * S / (1.0 + S)


def plant_model():
    m = Model(name="bio_plant")
    m.set_dynamical_states(["Xc", "S"])
    m.set_inputs(["D"])
    m.set_dynamical_equations(lambda x, u: jnp.array([
        monod(x[1]) * x[0] - u[0] * x[0],
        -2.0 * monod(x[1]) * x[0] - u[0] * (x[1] - 10.0)]))
    return m


def structured_model():
    # growth rate mu left as an unknown parameter (the ML target)
    m = Model(name="bio_gray_box")
    m.set_dynamical_states(["Xc", "S"])
    m.set_inputs(["D"])
    m.set_parameters(["mu"])
    m.set_dynamical_equations(lambda x, u, p: jnp.array([
        p[0] * x[0] - u[0] * x[0],
        -2.0 * p[0] * x[0] - u[0] * (x[1] - 10.0)]))
    return m


# train the rate surrogate on (S, mu) data
rng = np.random.default_rng(0)
S = rng.uniform(0.0, 8.0, size=(600, 1))
ann = ANN(["S"], ["mu"])
ann.add_layers(Dense(24, activation="tanh"))
ann.train(batch_size=64, epochs=400, X=S, y=monod(S[:, 0]), patience=150)

hybrid = structured_model() + ann          # substitutes parameter 'mu'
assert hybrid.parameters == []

nmpc = NMPC(hybrid)
nmpc.horizon = 10
nmpc.quad_stage_cost.add_states(names=["Xc"], weights=5.0, ref=[1.5])
nmpc.quad_stage_cost.add_inputs(weights=0.05)
nmpc.set_box_constraints(u_lb=[0.0], u_ub=[1.0])
nmpc.setup(options={"dt": 0.25})

plant = plant_model()
plant.setup(dt=0.25, integration_method="rk4")
plant.set_initial_conditions([0.3, 4.0])
x = np.array([0.3, 4.0])
for k in range(25):
    u = nmpc.optimize(x)
    x = plant.simulate(u=u, steps=1)["x"][-1]
print(f"hybrid-NMPC biomass: {x[0]:.4f} (target 1.5), "
      f"converged={nmpc.stats['converged']}")
