"""Path-following NMPC with soft state constraints (BASELINE configs[3];
reference example: formula1 path-following)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from hilo_mpc_tpu import Model, NMPC

# kinematic vehicle point: positions driven by commanded velocities
model = Model(name="vehicle")
model.set_dynamical_states(["px", "py"])
model.set_inputs(["vx", "vy"])
model.set_dynamical_equations(lambda x, u: u)

# the path: a figure-of-eight-ish curve parameterized by theta
path_fn = lambda th: jnp.stack([jnp.sin(th), jnp.sin(th) * jnp.cos(th)])

nmpc = NMPC(model)
nmpc.horizon = 15
nmpc.quad_stage_cost.add_states(names=["px", "py"], weights=[30.0, 30.0],
                                path_following=True, path_fn=path_fn)
nmpc.quad_stage_cost.add_inputs(weights=[0.05, 0.05])
nmpc.set_box_constraints(u_lb=[-2.0, -2.0], u_ub=[2.0, 2.0],
                         x_ub=[1.2, 0.6], x_soft=True, soft_weight=1e3)
nmpc.create_path_variable(u_pf_lb=0.0, u_pf_ub=1.5, speed_ref=0.8,
                          speed_weight=2.0)
nmpc.setup(options={"dt": 0.1})

x = np.array([0.0, 0.0])
traj = [x]
for k in range(60):
    u = nmpc.optimize(x)
    x = x + 0.1 * u
    traj.append(x.copy())
traj = np.asarray(traj)
# distance of each visited position to the curve (dense parametric sampling)
ths = np.linspace(0.0, 8.0, 4000)
curve = np.stack([np.sin(ths), np.sin(ths) * np.cos(ths)], axis=1)
dists = np.array([np.min(np.linalg.norm(curve - pt, axis=1))
                  for pt in traj[10:]])
print(f"path progress theta = {nmpc._theta_path0:.2f}, "
      f"max distance to path after transient = {dists.max():.3f}")
assert dists.max() < 0.1

if _os.environ.get("HILO_EXAMPLES_OUT"):     # gallery figure
    import _gallery as _g

    fig, axes = _g.new_fig(1, height=4.2, width=5.6)
    ax = axes[0][0]
    ax.plot(curve[:, 0], curve[:, 1], color=_g.MUTED, lw=1.2, ls="--",
            label="reference path")
    ax.plot(traj[:, 0], traj[:, 1], color=_g.SERIES[0], lw=2,
            label="vehicle")
    ax.plot(traj[0, 0], traj[0, 1], "o", color=_g.SERIES[0], ms=8)
    _g.style(ax, "Path following: traversed trajectory vs reference curve",
             xlabel="p_x", ylabel="p_y")
    ax.set_aspect("equal")
    _g.legend(ax)
    _g.save(fig, "path_following.png")
