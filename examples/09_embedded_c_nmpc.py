"""Embedded NONLINEAR MPC: export the CSTR controller as dependency-free C99,
compile it with the system compiler, and run the compiled controller in closed
loop against the Python solver.

The generated code (embedded/nmpc_codegen.py) transpiles the model's DSL
equations to C, discretizes with RK4, and solves each step with a
single-shooting Gauss-Newton SQP + FISTA box QP — suitable for
microcontroller-class targets, no libraries beyond libm. The reference's
embedded layer (muAO-MPC) covers linear MPC only.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hilo_mpc_tpu import NMPC
from hilo_mpc_tpu.embedded.codegen import compile_shared
from hilo_mpc_tpu.embedded.nmpc_codegen import generate_nmpc_c, load_nmpc
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

P = [1.0] * 6
SETPOINT = [0.3, 0.18055]

nmpc = NMPC(cstr_schaffner_and_zeitz())
nmpc.horizon = 20
nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=SETPOINT)
nmpc.quad_stage_cost.add_inputs(weights=0.1)
nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
nmpc.set_parameters(P)
nmpc.setup(options={"dt": 0.1})

workdir = tempfile.mkdtemp(prefix="hilo_embedded_")
src = generate_nmpc_c(nmpc, os.path.join(workdir, "cstr_nmpc.c"))
print(f"generated {src} ({os.path.getsize(src)} bytes of C99)")
so = compile_shared(src)
c_controller = load_nmpc(so, nx=2, nu=1)

plant = cstr_schaffner_and_zeitz()
plant.setup(dt=0.1, integration_method="rk4")
plant.set_initial_conditions([0.2, 0.1])
plant.set_initial_parameter_values(P)

x = np.array([0.2, 0.1])
worst = 0.0
for k in range(25):
    u_c = c_controller(x)                       # compiled C solve
    u_py = np.asarray(nmpc.optimize(x)).ravel()  # host solver, same NLP
    worst = max(worst, abs(float(u_c[0]) - float(u_py[0])))
    x = plant.simulate(u=u_c, steps=1)["x"][-1]

print(f"final state {np.asarray(x).round(5)} (setpoint {SETPOINT})")
print(f"max |u_C - u_python| over the loop: {worst:.2e}")
assert worst < 2e-4
assert np.linalg.norm(x - SETPOINT) < 5e-3
print("embedded C controller matches the host NMPC.")
