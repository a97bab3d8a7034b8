"""Auxiliary subsystems: AOT export/reload, SolveTimer stats, Session/TempDir
(SURVEY.md §5 — tracing/profiling, checkpoint/resume, session/tempdir)."""
import os

import numpy as np
import pytest

from hilo_mpc_tpu import Model
from hilo_mpc_tpu.utils.aot import export_function, export_model_step, load_function
from hilo_mpc_tpu.utils.profiling import SolveTimer
from hilo_mpc_tpu.utils.session import Session, TempDir


def pendulum():
    import jax.numpy as jnp

    m = Model(name="pend")
    m.set_dynamical_states(["th", "om"])
    m.set_inputs("tau")
    m.set_measurements(["y_th"])
    m.set_dynamical_equations(
        lambda x, u: jnp.array([x[1], -jnp.sin(x[0]) - 0.3 * x[1] + u[0]]))
    m.set_measurement_equations(lambda x: x[:1])
    return m


class TestAOT:
    def test_export_and_reload_function(self, tmp_path):
        import jax.numpy as jnp

        path = str(tmp_path / "fn.hlo")
        export_function(lambda a: 2.0 * a + 1.0, (jnp.zeros(3),), path)
        assert os.path.exists(path)
        fn = load_function(path)
        np.testing.assert_allclose(np.asarray(fn(jnp.array([1.0, 2.0, 3.0]))),
                                   [3.0, 5.0, 7.0], atol=1e-6)

    def test_export_model_step_roundtrip(self, tmp_path):
        m = pendulum()
        m.setup(dt=0.1, integration_method="rk4")
        m.set_initial_conditions([0.3, 0.0])
        path = export_model_step(m, str(tmp_path / "step.hlo"))
        fn = load_function(path)
        import jax.numpy as jnp

        dt = m.dtype  # exported artifact is specialized to the model dtype
        out = fn(jnp.array([0.3, 0.0], dt), jnp.zeros(0, dt),
                 jnp.array([0.1], dt), jnp.zeros(0, dt))
        ref = m.simulate(u=np.array([[0.1]]), steps=1)["x"][-1]
        x_next = np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
        np.testing.assert_allclose(x_next.ravel()[:2], ref, atol=1e-6)


class TestSolveTimer:
    def test_percentiles(self):
        t = SolveTimer()
        for _ in range(20):
            with t.measure():
                sum(range(1000))
        s = t.stats()
        assert s["n"] == 20
        assert 0 <= s["p50_ms"] <= s["p99_ms"]

    def test_empty_timer_stats(self):
        s = SolveTimer().stats()
        assert s["n"] == 0


class TestSessionTempDir:
    def test_tempdir_context_cleans_up(self):
        with TempDir() as d:
            p = d if isinstance(d, str) else d.path
            assert os.path.isdir(p)
            with open(os.path.join(p, "x.txt"), "w") as f:
                f.write("hi")
        assert not os.path.exists(p)

    def test_session_context(self, tmp_path):
        with Session(compilation_cache=str(tmp_path / "cache")) as s:
            assert s is not None
