"""GP-based stochastic MPC with chance constraints, scenario-batched
(BASELINE configs[4]: GP output-feedback MPC + scenario-batched stochastic MPC)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from hilo_mpc_tpu import GP, Model, SMPC


def nominal_model():
    m = Model(name="msd")
    m.set_dynamical_states(["pos", "vel"])
    m.set_inputs("f")
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], -0.6 * x[0] - 0.4 * x[1] + u[0]]))
    return m


# fit a GP to residual-dynamics data (here: a synthetic nonlinear friction term)
rng = np.random.default_rng(0)
V = rng.uniform(-1.5, 1.5, size=(30, 1))
resid = -0.08 * np.tanh(3.0 * V[:, 0]) + 0.01 * rng.standard_normal(30)
gp = GP(["vel"], ["d_vel"], noise_variance=1e-4)
gp.set_training_data(V, resid)
gp.setup()
gp.fit_model()

smpc = SMPC(nominal_model(), gps={"vel": gp},
            feedback_gain=np.array([[1.0, 0.8]]), dt=0.1)
smpc.horizon = 12
smpc.quad_stage_cost.add_states(names=["pos", "vel"], weights=[5.0, 1.0],
                                ref=[0.8, 0.0])
smpc.quad_stage_cost.add_inputs(weights=0.1)
smpc.set_box_constraints(u_lb=-2.0, u_ub=2.0)
smpc.set_box_chance_constraints(x_ub=[0.85, np.inf], level=0.95)
smpc.set_initial_covariance(np.eye(2) * 1e-4)
smpc.setup(options={"dt": 0.1})

u = smpc.optimize([0.0, 0.0])
pred = smpc.return_prediction()["x"]
print(f"first move u={u[0]:.4f}, converged={smpc.stats['converged']}")
print(f"predicted mean pos_max={pred[:, 0].max():.4f} "
      f"(chance bound 0.85 with 95% back-off)")

# scenario-batched stochastic MPC: many initial states at once
x0s = np.zeros((256, 6))
x0s[:, :2] = rng.normal([0.0, 0.0], [0.2, 0.1], size=(256, 2))
x0s[:, 2:] = np.tile(np.eye(2).ravel() * 1e-4, (256, 1))
u_batch, sol = smpc.optimize_batch(x0s)
print(f"batched SMPC: {u_batch.shape[0]} scenarios, "
      f"{float(np.asarray(sol.converged).mean()) * 100:.1f}% converged")

if _os.environ.get("HILO_EXAMPLES_OUT"):     # gallery figure
    import _gallery as _g
    from scipy.special import erfinv

    kappa = float(np.sqrt(2.0) * erfinv(2 * 0.95 - 1.0))
    mu_pos = pred[:, 0]
    sig_pos = np.sqrt(np.maximum(pred[:, 2], 0.0))  # P_00 surrogate state
    t = 0.1 * np.arange(pred.shape[0])
    fig, axes = _g.new_fig(1)
    ax = axes[0][0]
    ax.fill_between(t, mu_pos - kappa * sig_pos, mu_pos + kappa * sig_pos,
                    color=_g.SERIES[0], alpha=0.18, lw=0,
                    label="95% band (GP covariance)")
    ax.plot(t, mu_pos, color=_g.SERIES[0], lw=2, label="predicted mean pos")
    ax.axhline(0.85, color=_g.SERIES[3], lw=1.5, ls="--",
               label="chance bound 0.85")
    _g.style(ax, "SMPC prediction: the erfinv back-off keeps the 95% band "
             "under the bound", xlabel="time [s]", ylabel="position")
    _g.legend(ax)
    _g.save(fig, "chance_constraint.png")
