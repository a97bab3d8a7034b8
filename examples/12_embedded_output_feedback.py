"""Fully-embedded output feedback: C99 NMPC + C99 EKF, no Python in the loop.

Exports the CSTR controller (single-shooting Gauss-Newton SQP, FISTA box
QPs) AND the extended Kalman filter (FD Jacobians, Joseph form) as
dependency-free C99, compiles both, and runs the closed loop entirely
through the compiled artifacts: measure -> C EKF -> C NMPC -> plant. The
host solvers are only used to cross-check the result. The reference's
embedded layer (muAO-MPC) is linear-MPC-only and has no estimator.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hilo_mpc_tpu import NMPC
from hilo_mpc_tpu.embedded import compile_shared
from hilo_mpc_tpu.embedded.ekf_codegen import generate_ekf_c, load_ekf
from hilo_mpc_tpu.embedded.nmpc_codegen import generate_nmpc_c, load_nmpc
from hilo_mpc_tpu.estimation import ExtendedKalmanFilter
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

P = [1.0] * 6
SETPOINT = [0.3, 0.18055]

# -- export + compile both artifacts ----------------------------------------
nmpc = NMPC(cstr_schaffner_and_zeitz())
nmpc.horizon = 12
nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=SETPOINT)
nmpc.quad_stage_cost.add_inputs(weights=0.1)
nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
nmpc.set_parameters(P)
nmpc.setup(options={"dt": 0.1})

ekf = ExtendedKalmanFilter(cstr_schaffner_and_zeitz())
ekf.Q = np.diag([1e-4, 2e-4])
ekf.R = np.array([[1e-4]])
ekf.set_initial_parameter_values(P)
ekf.setup(dt=0.1)

import tempfile

_tmp = tempfile.mkdtemp(prefix="hilo_embedded_")
step_nmpc = load_nmpc(compile_shared(
    generate_nmpc_c(nmpc, os.path.join(_tmp, "cstr_nmpc_of.c"))), nx=2, nu=1)
step_ekf = load_ekf(compile_shared(
    generate_ekf_c(ekf, os.path.join(_tmp, "cstr_ekf_of.c"))), nx=2, ny=1,
    nu=1)

# -- closed loop through the C artifacts ------------------------------------
def plant_step(x, u):
    def ode(x):
        r = (1.0 - x[0]) * np.exp(-1.0 / (1.0 + x[1]))
        return np.array([-x[0] + r, -x[1] + r + u[0]])
    k1 = ode(x); k2 = ode(x + 0.05 * k1)
    k3 = ode(x + 0.05 * k2); k4 = ode(x + 0.1 * k3)
    return x + (0.1 / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


rng = np.random.default_rng(0)
x_true = np.array([0.2, 0.1])
x_est, P_cov = np.array([0.25, 0.08]), 0.05 * np.eye(2)
for k in range(40):
    u = np.atleast_1d(step_nmpc(x_est))              # C controller
    x_true = plant_step(x_true, u)
    y = np.array([x_true[1] + 0.002 * rng.standard_normal()])
    x_est, P_cov = step_ekf(x_est, P_cov, u, y, t=0.1 * k)   # C filter

err_track = np.linalg.norm(x_true - SETPOINT)
err_est = np.abs(x_est - x_true).max()
print(f"embedded output-feedback loop (C NMPC + C EKF): "
      f"|x - x*| = {err_track:.2e}, |x_est - x| = {err_est:.2e}")
assert err_track < 1e-2 and err_est < 1e-2

# cross-check one solve against the host interior point
u_c = np.atleast_1d(step_nmpc(np.array([0.2, 0.1])))
u_h = np.atleast_1d(nmpc.optimize([0.2, 0.1]))
print(f"C vs host first move at [0.2, 0.1]: {u_c} vs {u_h} "
      f"(|Δ| = {np.abs(u_c - u_h).max():.1e})")
import shutil

shutil.rmtree(_tmp, ignore_errors=True)
