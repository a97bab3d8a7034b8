"""Joint estimate-then-control: MHE + NMPC on the CSTR (BASELINE configs[2];
reference example: MHE chemical reaction)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import numpy as np

from hilo_mpc_tpu import MHE, NMPC, SimpleControlLoop
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

P = [1.0] * 6

plant = cstr_schaffner_and_zeitz()
plant.setup(dt=0.1, integration_method="rk4")
plant.set_initial_conditions([0.2, 0.1])
plant.set_initial_parameter_values(P)

nmpc = NMPC(cstr_schaffner_and_zeitz())
nmpc.horizon = 12
nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=[0.3, 0.18055])
nmpc.quad_stage_cost.add_inputs(weights=0.1)
nmpc.set_parameters(P)
nmpc.setup(options={"dt": 0.1})

mhe = MHE(cstr_schaffner_and_zeitz())
mhe.horizon = 8
mhe.Q = 1e-6          # process-noise weight (inverted internally)
mhe.R = 1e-5          # measurement-noise weight
mhe.P0 = np.eye(2) * 0.05
mhe.set_initial_parameter_values(P)
mhe.setup(dt=0.1)
mhe.set_initial_guess([0.25, 0.12])

loop = SimpleControlLoop(plant, nmpc, mhe)
loop.run(25)
print("true final state:", plant.solution["x:f"])
print("MHE stats:", mhe.stats)

if _os.environ.get("HILO_EXAMPLES_OUT"):     # gallery figure
    import _gallery as _g

    Xt = np.asarray(plant.solution["x"])
    Xt = Xt.T if Xt.shape[0] == 2 else Xt
    Xe = np.asarray(mhe.solution["x"])
    Xe = Xe.T if Xe.ndim == 2 and Xe.shape[0] == 2 else Xe
    t = 0.1 * np.arange(Xt.shape[0])
    te = t[-Xe.shape[0]:] if Xe.shape[0] else t[:0]
    fig, axes = _g.new_fig(2)
    for i in range(2):
        ax = axes[i][0]
        ax.plot(t, Xt[:, i], color=_g.SERIES[0], lw=2, label="true")
        if Xe.shape[0]:
            ax.plot(te, Xe[:, i], color=_g.SERIES[1], lw=2, ls="--",
                    label="MHE estimate")
        _g.style(ax, f"x{i + 1}: true plant vs MHE estimate",
                 xlabel="time [h]" if i else None, ylabel=f"x{i + 1}")
        _g.legend(ax)
    _g.save(fig, "mhe_vs_true.png")
