"""Cross-instance trace registry (utils/trace_cache.py).

The registry must (a) share traced solvers between same-configuration
controller/estimator instances — the reference compiles once per object
(mpc.py:1778-1787), we compile once per configuration — and (b) NEVER
collide two configurations that differ in anything baked into the traces.
"""
import time

import numpy as np
import pytest

from hilo_mpc_tpu import MHE, Model, NMPC
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz
from hilo_mpc_tpu.utils.trace_cache import (clear_trace_registry,
                                            trace_registry_stats)

P_CSTR = [1.0] * 6


def _build_nmpc(weights=(10.0, 10.0), horizon=8, dt=0.1, ref=(0.3, 0.18055),
                u_w=0.1, **opts):
    n = NMPC(cstr_schaffner_and_zeitz())
    n.horizon = horizon
    n.quad_stage_cost.add_states(weights=list(weights), ref=list(ref))
    n.quad_stage_cost.add_inputs(weights=u_w)
    n.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    n.set_parameters(P_CSTR)
    n.setup(options={"dt": dt, **opts})
    return n


def test_same_config_shares_trace_and_solution():
    clear_trace_registry()
    n1 = _build_nmpc()
    u1 = n1.optimize([0.2, 0.1])
    t0 = time.perf_counter()
    n2 = _build_nmpc()
    u2 = n2.optimize([0.2, 0.1])
    dt_second = time.perf_counter() - t0
    assert trace_registry_stats()["entries"] == 1
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=0, atol=0)
    # directive: repeat controller construction must not pay the retrace
    assert dt_second < 0.3, f"second same-config instance took {dt_second:.2f}s"


@pytest.mark.parametrize("variant", [
    dict(weights=(20.0, 10.0)),
    dict(horizon=9),
    dict(dt=0.05),
    dict(ref=(0.25, 0.15)),
    dict(u_w=0.2),
    dict(integration_method="euler"),
    dict(max_iter=17),
    dict(tol=3e-5),
    dict(mu_init=5e-2),
])
def test_no_collision_across_configs(variant):
    clear_trace_registry()
    base = _build_nmpc()
    other = _build_nmpc(**variant)
    assert trace_registry_stats()["entries"] == 2
    ub = base.optimize([0.2, 0.1])
    uo = other.optimize([0.2, 0.1])
    # for cost/weight variants the solutions must actually differ
    if set(variant) & {"weights", "ref", "u_w"}:
        assert not np.allclose(np.asarray(ub), np.asarray(uo))


def test_scaling_and_constraint_values_in_key():
    clear_trace_registry()
    n1 = _build_nmpc()
    n2 = _build_nmpc()
    n2.set_scaling(x_scaling=[2.0, 1.0])
    n2.setup(options={"dt": 0.1})
    assert trace_registry_stats()["entries"] == 2


def test_callable_models_do_not_false_share():
    clear_trace_registry()

    def make(k):
        m = Model()
        m.set_dynamical_equations(lambda x, u: np.float64(k) * -x + u)
        m._x.add(1, prefix="x"); m._u.add(1, prefix="u")
        return m

    sols = []
    for k in (1.0, 3.0):
        m = make(k)
        n = NMPC(m)
        n.horizon = 5
        n.quad_stage_cost.add_states(weights=[1.0], ref=[0.5])
        n.quad_stage_cost.add_inputs(weights=0.1)
        n.setup(options={"dt": 0.1})
        sols.append(np.asarray(n.optimize([0.0])))
    # different dynamics closures -> id-keyed, never collide
    assert not np.allclose(sols[0], sols[1])


def test_state_space_models_share_by_content():
    clear_trace_registry()
    A = [[0.0, 1.0], [-1.0, -0.4]]
    B = [[0.0], [1.0]]

    def build(a):
        m = Model()
        m.set_state_space(A=a, B=B)
        n = NMPC(m)
        n.horizon = 6
        n.quad_stage_cost.add_states(weights=[1.0, 1.0])
        n.quad_stage_cost.add_inputs(weights=0.1)
        n.setup(options={"dt": 0.1})
        return n

    build(A); build(A)
    assert trace_registry_stats()["entries"] == 1
    build([[0.0, 1.0], [-2.0, -0.4]])
    assert trace_registry_stats()["entries"] == 2


def test_mhe_shares_and_respects_weights():
    clear_trace_registry()

    def build(wm):
        mhe = MHE(cstr_schaffner_and_zeitz(), plot_backend=None)
        mhe.horizon = 5
        mhe.quad_stage_cost.add_measurements(weights=wm)
        mhe.quad_stage_cost.add_state_noise(weights=10.0)
        mhe.quad_arrival_cost.W_arrival_x = np.eye(2)
        mhe.set_initial_guess([0.2, 0.1])
        mhe.set_initial_parameter_values(P_CSTR)
        mhe.setup(dt=0.1)
        return mhe

    build(5.0); build(5.0)
    assert trace_registry_stats()["entries"] == 1
    build(7.0)
    assert trace_registry_stats()["entries"] == 2


def test_registry_survives_mi_and_generic_cost_opt_out():
    clear_trace_registry()
    # generic (economic) cost -> id-keyed per instance: two instances with
    # fresh lambdas must NOT share an entry (conservative), but must both work
    def build():
        n = NMPC(cstr_schaffner_and_zeitz())
        n.horizon = 5
        n.stage_cost.cost = lambda x, u: (x[0] - 0.3) ** 2 + 0.1 * u[0] ** 2
        n.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
        n.set_parameters(P_CSTR)
        n.setup(options={"dt": 0.1})
        return n

    u1 = build().optimize([0.2, 0.1])
    u2 = build().optimize([0.2, 0.1])
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-10)
    assert trace_registry_stats()["entries"] == 2
