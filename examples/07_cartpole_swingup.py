"""Cart-pole swing-up NMPC (reference example family: pendulum MPC).

A hard nonconvex problem: drive the pendulum from hanging (theta = pi) to upright
(theta = 0) with a force-limited cart on a bounded track. Exercises multi-start over
perturbed initial guesses and long-horizon solves.
"""
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hilo_mpc_tpu import Model, NMPC  # noqa: E402

MC, MP, L, G = 1.0, 0.2, 0.5, 9.81


def cartpole() -> Model:
    m = Model(name="cartpole")
    m.set_dynamical_states(["pos", "th", "v", "om"])
    m.set_inputs("F")

    def ode(x, u):
        pos, th, v, om = x
        s, c = jnp.sin(th), jnp.cos(th)
        denom = MC + MP * s ** 2
        a = (u[0] + MP * s * (L * om ** 2) - MP * G * s * c) / denom
        alpha = (-u[0] * c - MP * L * om ** 2 * s * c + (MC + MP) * G * s) / (
            L * denom)
        return jnp.array([v, om, a, alpha])

    m.set_dynamical_equations(ode)
    return m


def build_controller(N=60, dt=0.05) -> NMPC:
    nmpc = NMPC(cartpole())
    nmpc.horizon = N
    nmpc.quad_stage_cost.add_states(weights=[2.0, 10.0, 0.1, 0.1],
                                    ref=[0.0, 0.0, 0.0, 0.0])
    nmpc.quad_stage_cost.add_inputs(weights=0.01)
    nmpc.quad_terminal_cost.add_states(weights=[10.0, 100.0, 1.0, 1.0],
                                       ref=[0.0] * 4)
    nmpc.set_box_constraints(u_lb=-15.0, u_ub=15.0,
                             x_lb=[-2.0, -np.inf, -np.inf, -np.inf],
                             x_ub=[2.0, np.inf, np.inf, np.inf])
    nmpc.setup(options={"dt": dt, "max_iter": 150, "tol": 1e-6})
    return nmpc


if __name__ == "__main__":
    nmpc = build_controller()
    nmpc.optimize([0.0, np.pi, 0.0, 0.0], runs=6, seed=0)
    X = nmpc.return_prediction()["x"]
    print(f"swing-up plan: theta pi -> {X[-1, 1]:.3f} rad, "
          f"cart ends at {X[-1, 0]:.2f} m, "
          f"{nmpc.stats['iterations']} IP iterations, "
          f"KKT {nmpc.stats['kkt_error']:.1e}")

    # closed loop: replan from the realized state every step
    plant = cartpole()
    plant.setup(dt=0.05, integration_method="rk4")
    x = np.array([0.0, np.pi, 0.0, 0.0])
    hist = [x.copy()]
    for k in range(80):
        u = nmpc.optimize(x)
        x = plant.simulate(x0=x, u=u, steps=1, store=False)["x"][-1]
        hist.append(np.asarray(x).copy())
    print(f"closed loop after 4 s: theta={x[1]:.3f}, pos={x[0]:.3f}, "
          f"|omega|={abs(x[3]):.3f}")

    import os as _os
    if _os.environ.get("HILO_EXAMPLES_OUT"):     # gallery figure
        import _gallery as _g

        H = np.asarray(hist)
        t = 0.05 * np.arange(H.shape[0])
        fig, axes = _g.new_fig(1)
        ax = axes[0][0]
        ax.plot(t, H[:, 1], color=_g.SERIES[0], lw=2, label="theta [rad]")
        ax.plot(t, H[:, 0], color=_g.SERIES[1], lw=2, label="cart pos [m]")
        ax.axhline(0.0, color=_g.MUTED, lw=1, ls="--", alpha=0.6)
        _g.style(ax, "Cart-pole swing-up: pi -> 0 under replanning NMPC",
                 xlabel="time [s]")
        _g.legend(ax)
        _g.save(fig, "swingup.png")
