"""Round-2 parity closures: Warp kernel operator, NMPC.plot_prediction,
MHE multi-start (runs=), SimpleControlLoop live_plot.

Reference anchors: gp/kernel.py:1669 (Warp), mpc.py:868 (plot_prediction),
mhe.py:386-399 (runs kwarg), control_loop.py:202-285 (live plotting).
"""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from hilo_mpc_tpu import Model, NMPC, SimpleControlLoop
from hilo_mpc_tpu.estimation.mhe import MovingHorizonEstimator as MHE
from hilo_mpc_tpu.ml.gp.kernels import (SquaredExponentialKernel, Warp,
                                        LinearKernel)


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


class TestWarpKernel:
    def test_identity_warp_matches_base(self):
        X = np.random.default_rng(0).standard_normal((5, 2))
        base = SquaredExponentialKernel()
        k = Warp(SquaredExponentialKernel(), lambda x: x)
        np.testing.assert_allclose(np.asarray(k(X)), np.asarray(base(X)),
                                   rtol=1e-12)

    def test_warp_equals_base_on_transformed_inputs(self):
        import jax.numpy as jnp

        X = np.abs(np.random.default_rng(1).standard_normal((6, 1))) + 0.1
        base = SquaredExponentialKernel()
        k = Warp(SquaredExponentialKernel(), jnp.log)
        np.testing.assert_allclose(np.asarray(k(X)),
                                   np.asarray(base(np.log(X))), rtol=1e-10)

    def test_warp_gram_is_psd(self):
        import jax.numpy as jnp

        X = np.random.default_rng(2).standard_normal((8, 2))
        k = Warp(LinearKernel(), jnp.tanh)
        K = np.asarray(k(X))
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-9

    def test_warp_hyperparameters_are_base_kernels(self):
        base = SquaredExponentialKernel()
        k = Warp(base, lambda x: x)
        assert [h.name for h in k.hyperparameters] == \
            [h.name for h in base.hyperparameters]

    def test_warp_requires_callable(self):
        with pytest.raises(TypeError, match="callable"):
            Warp(SquaredExponentialKernel(), 3.0)

    def test_warp_in_gp_fit_predict(self):
        import jax.numpy as jnp

        from hilo_mpc_tpu.ml.gp.gp import GaussianProcess

        rng = np.random.default_rng(3)
        X = rng.uniform(0.2, 3.0, (25, 1))
        y = np.sin(np.log(X[:, 0]) * 3.0)
        gp = GaussianProcess(["x"], ["y"],
                             kernel=Warp(SquaredExponentialKernel(), jnp.log))
        gp.set_training_data(X.T, y[None, :])
        gp.setup()
        gp.fit_model()
        mu, _ = gp.predict(X.T)
        assert np.abs(np.asarray(mu).ravel() - y).max() < 0.1

    def test_top_level_export(self):
        import hilo_mpc_tpu as h

        assert h.Warp is Warp


@pytest.fixture(scope="module")
def small_nmpc():
    nmpc = NMPC(pendulum())
    nmpc.horizon = 8
    nmpc.quad_stage_cost.add_states(weights=[5.0, 1.0], ref=[0.5, 0.0])
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-3.0], u_ub=[3.0])
    nmpc.setup(options={"dt": 0.1, "integration_method": "rk4"})
    return nmpc


class TestPlotPrediction:
    def test_requires_solve_first(self, small_nmpc):
        small_nmpc.last_prediction = None
        with pytest.raises(RuntimeError, match="optimize"):
            small_nmpc.plot_prediction()

    def test_plot_prediction_panels_and_save(self, small_nmpc, tmp_path):
        small_nmpc.optimize([0.2, 0.0])
        fig = small_nmpc.plot_prediction(
            save_plot=True, plot_dir=str(tmp_path), name_file="pred.png",
            extras={"th": np.full(9, 0.5)}, extras_names=["setpoint"],
            title="pendulum")
        assert len(fig.axes) == 3  # th, om, tau
        assert (tmp_path / "pred.png").exists()
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_matches_return_prediction(self, small_nmpc):
        small_nmpc.optimize([0.1, 0.0])
        pred = small_nmpc.return_prediction()
        fig = small_nmpc.plot_prediction()
        line = fig.axes[0].lines[0]
        np.testing.assert_allclose(line.get_ydata(), pred["x"][:, 0])
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestMHEMultiStart:
    def _mhe(self):
        mhe = MHE(pendulum())
        mhe.horizon = 6
        mhe.Q = 1e-3
        mhe.R = 1e-3
        mhe.setup(dt=0.05)
        mhe.set_initial_guess([0.4, 0.1])
        return mhe

    def _data(self, steps=10):
        plant = pendulum()
        plant.setup(dt=0.05, integration_method="rk4")
        plant.set_initial_conditions([0.5, 0.0])
        U = 0.2 * np.sin(np.linspace(0, 4, steps))[:, None]
        out = plant.simulate(u=U, steps=steps)
        rng = np.random.default_rng(0)
        Y = out["y"] + 0.01 * rng.standard_normal(out["y"].shape)
        return out["x"], U, Y

    def test_runs_matches_single_on_convex_window(self):
        X, U, Y = self._data()
        mhe1, mheN = self._mhe(), self._mhe()
        x1 = xN = None
        for k in range(len(U)):
            r1 = mhe1.estimate(y=Y[k], u=U[k])
            rN = mheN.estimate(y=Y[k], u=U[k], runs=4, pert_factor=0.2)
            if r1 is not None:
                x1, xN = r1, rN
        assert x1 is not None
        # the window problem is benign: every start converges to the same
        # minimum, so multi-start returns the identical estimate
        np.testing.assert_allclose(np.asarray(xN), np.asarray(x1), atol=1e-5)

    def test_runs_tracks_true_state(self):
        X, U, Y = self._data(steps=14)
        mhe = self._mhe()
        x_hat = None
        for k in range(len(U)):
            r = mhe.estimate(y=Y[k], u=U[k], runs=3)
            if r is not None:
                x_hat = r
        assert x_hat is not None
        assert np.abs(np.asarray(x_hat) - X[-1]).max() < 0.1

    def test_runs_stats_recorded(self):
        _, U, Y = self._data()
        mhe = self._mhe()
        for k in range(len(U)):
            mhe.estimate(y=Y[k], u=U[k], runs=2)
        assert mhe.stats["converged"]


class TestLivePlot:
    def _loop(self):
        plant = pendulum()
        plant.setup(dt=0.1, integration_method="rk4")
        plant.set_initial_conditions([0.4, 0.0])
        nmpc = NMPC(pendulum())
        nmpc.horizon = 5
        nmpc.quad_stage_cost.add_states(weights=[5.0, 1.0], ref=[0.0, 0.0])
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.setup(options={"dt": 0.1, "integration_method": "rk4"})
        return SimpleControlLoop(plant, nmpc)

    def test_live_plot_draws_each_step(self, monkeypatch):
        import hilo_mpc_tpu.control_loop as cl

        created = {}
        orig = cl._LiveLoopPlot

        def capture(solution, pause=1e-3):
            obj = orig(solution, pause)
            created["plot"] = obj
            return obj

        monkeypatch.setattr(cl, "_LiveLoopPlot", capture)
        loop = self._loop()
        sol = loop.run(4, live_plot=True)
        assert created["plot"].n_draws == 4
        assert sol.n_samples == 4
        # panel data matches the recorded solution
        line = created["plot"]._lines[0]
        np.testing.assert_allclose(line.get_ydata(), sol["x"][0])
        import matplotlib.pyplot as plt

        plt.close(created["plot"].fig)

    def test_live_plot_refs_bounds_overlays(self):
        # refs/bounds live_plot_kwargs draw static overlays on the matplotlib
        # live backend (same contract as the bokeh live plot's Spans)
        import matplotlib.pyplot as plt

        loop = self._loop()
        sol = loop.run(2, live_plot=True,
                       live_plot_kwargs={"refs": {"th": 0.0},
                                         "bounds": {"tau": (-3.0, 3.0)}})
        assert sol.n_samples == 2
        by_label = {ax.get_ylabel(): ax
                    for n in plt.get_fignums()
                    for ax in plt.figure(n).axes}
        th_lines = [ln for ln in by_label["th"].get_lines()
                    if ln.get_linestyle() == "--"]
        assert len(th_lines) == 1 and th_lines[0].get_ydata()[0] == 0.0
        tau_lines = [ln for ln in by_label["tau"].get_lines()
                     if ln.get_linestyle() == ":"]
        assert sorted(ln.get_ydata()[0] for ln in tau_lines) == [-3.0, 3.0]
        plt.close("all")

    def test_live_plot_unknown_kwargs_warn_on_mpl(self):
        loop = self._loop()
        with pytest.warns(UserWarning, match="ignored on matplotlib"):
            loop.run(1, live_plot=True, live_plot_kwargs={"mode": "server"})
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_live_plot_off_creates_no_figure(self, monkeypatch):
        import hilo_mpc_tpu.control_loop as cl

        def boom(*a, **k):
            raise AssertionError("live plot must not be constructed")

        monkeypatch.setattr(cl, "_LiveLoopPlot", boom)
        loop = self._loop()
        loop.run(2, live_plot=False)

    def test_live_plot_bokeh_gate(self, monkeypatch):
        import hilo_mpc_tpu.utils.plotting as plotting

        monkeypatch.setattr(plotting, "_BACKEND", "bokeh")
        loop = self._loop()
        with pytest.raises(ImportError, match="bokeh"):
            loop.run(1, live_plot=True)
