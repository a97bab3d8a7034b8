"""Real-time-iteration NMPC: decouple control latency from solve latency.

`rti_prepare()` solves the horizon problem at the PREDICTED next state while
the plant is still moving; when the measurement arrives, `rti_feedback(x0)`
returns the first move corrected by the cached first-stage Riccati gain
(projected tangential predictor) in a fraction of a millisecond. The
reference (CasADi/IPOPT) pays the full NLP solve inside the loop
(hilo_mpc/modules/controller/mpc.py:1778-1787).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hilo_mpc_tpu import NMPC
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

P = [1.0] * 6
SETPOINT = [0.3, 0.18055]

plant = cstr_schaffner_and_zeitz()
plant.setup(dt=0.1, integration_method="rk4")
plant.set_initial_conditions([0.2, 0.1])
plant.set_initial_parameter_values(P)

nmpc = NMPC(cstr_schaffner_and_zeitz())
nmpc.horizon = 20
nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=SETPOINT)
nmpc.quad_stage_cost.add_inputs(weights=0.1)
nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
nmpc.set_parameters(P)
nmpc.setup(options={"dt": 0.1})

x = np.array([0.2, 0.1])
nmpc.rti_prepare(x_pred=x)          # first prepare: at the measured state
fb_lat, prep_lat, hist = [], [], [x.copy()]
for k in range(30):
    t0 = time.perf_counter()
    u = nmpc.rti_feedback(x)        # instant: cached move + K0 (x - x_pred)
    fb_lat.append(time.perf_counter() - t0)
    x = plant.simulate(u=u, steps=1)["x"][-1]
    hist.append(np.asarray(x).copy())
    stats = nmpc.rti_prepare()      # solve ahead at the predicted state
    prep_lat.append(stats["t_prepare"])

print(f"final state        {x}  (setpoint {SETPOINT})")
print(f"feedback latency   p50 {1e3 * np.median(fb_lat):.3f} ms")
print(f"prepare (hidden)   p50 {1e3 * np.median(prep_lat):.1f} ms, "
      f"{stats['iterations']} IP iterations")
assert np.linalg.norm(x - SETPOINT) < 5e-3

if _os.environ.get("HILO_EXAMPLES_OUT"):     # gallery figure
    import _gallery as _g

    H = np.asarray(hist)
    t = 0.1 * np.arange(H.shape[0])
    fig, axes = _g.new_fig(2)
    ax = axes[0][0]
    for i, c in enumerate(_g.SERIES[:2]):
        ax.plot(t, H[:, i], color=c, lw=2, label=f"x{i + 1}")
        ax.axhline(SETPOINT[i], color=c, lw=1, ls="--", alpha=0.5)
    _g.style(ax, "RTI closed loop (dashed = setpoint)", ylabel="state")
    _g.legend(ax)
    ax = axes[1][0]
    ks = np.arange(1, len(fb_lat) + 1)
    ax.semilogy(ks, 1e3 * np.asarray(prep_lat), color=_g.SERIES[1], lw=2,
                label="prepare (hidden, solve-ahead)")
    ax.semilogy(ks, 1e3 * np.asarray(fb_lat), color=_g.SERIES[0], lw=2,
                label="feedback (control latency)")
    _g.style(ax, "Per-step latency: feedback is decoupled from the solve",
             xlabel="loop step", ylabel="ms (log)")
    _g.legend(ax)
    _g.save(fig, "rti_latency.png")
