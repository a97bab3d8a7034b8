"""Standalone LP/QP/NLP solver tests + DataSet/DataGenerator tests."""
import numpy as np
import pytest

from hilo_mpc_tpu import LP, NLP, QP, Model
from hilo_mpc_tpu.utils.data import DataGenerator, DataSet


class TestNLP:
    def test_unconstrained_quadratic(self):
        nlp = NLP()
        nlp.set_decision_variables(2)
        nlp.set_objective(lambda x: (x[0] - 1.0) ** 2 + (x[1] + 2.0) ** 2)
        sol = nlp.solve(x0=[0.0, 0.0])
        assert sol["success"]
        np.testing.assert_allclose(sol["x"], [1.0, -2.0], atol=1e-6)

    def test_rosenbrock_bounded(self):
        nlp = NLP()
        nlp.set_decision_variables(2)
        nlp.set_objective(lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2)
        sol = nlp.solve(x0=[-1.0, 1.0], lbx=[-5, -5], ubx=[5, 5])
        assert sol["success"]
        np.testing.assert_allclose(sol["x"], [1.0, 1.0], atol=1e-4)

    def test_constrained_matches_scipy(self):
        from scipy.optimize import minimize

        nlp = NLP()
        nlp.set_decision_variables(2)
        nlp.set_objective(lambda x: x[0] ** 2 + x[1] ** 2)
        nlp.set_constraints(lambda x: x[0] + x[1], lb=1.0, n=1)
        sol = nlp.solve(x0=[1.0, 0.0])
        res = minimize(lambda x: x @ x, [1.0, 0.0],
                       constraints=[{"type": "ineq",
                                     "fun": lambda x: x[0] + x[1] - 1}])
        assert sol["success"]
        np.testing.assert_allclose(sol["x"], res.x, atol=1e-5)

    def test_missing_objective_raises(self):
        nlp = NLP()
        nlp.set_decision_variables(2)
        with pytest.raises(RuntimeError, match="set_objective"):
            nlp.setup()


class TestQPLP:
    def test_qp(self):
        qp = QP()
        qp.set_quadratic_objective(H=[[2.0, 0.0], [0.0, 2.0]], c=[-2.0, -4.0])
        sol = qp.solve(lbx=[0, 0], ubx=[10, 10])
        np.testing.assert_allclose(sol["x"], [1.0, 2.0], atol=1e-6)

    def test_qp_with_linear_constraints(self):
        qp = QP()
        qp.set_quadratic_objective(H=np.eye(2), c=[0.0, 0.0])
        qp.set_linear_constraints(A=[[1.0, 1.0]], lb=2.0)
        sol = qp.solve(x0=[1.0, 1.0])
        np.testing.assert_allclose(sol["x"], [1.0, 1.0], atol=1e-5)

    def test_lp(self):
        lp = LP()
        lp.set_linear_objective([-1.0, -2.0])
        lp.set_linear_constraints(A=[[1.0, 1.0]], ub=4.0)
        sol = lp.solve(lbx=[0, 0], ubx=[3, 3])
        assert sol["success"]
        np.testing.assert_allclose(sol["x"], [1.0, 3.0], atol=1e-5)


class TestDataSet:
    def test_add_and_access(self):
        ds = DataSet(["a", "b"], ["y"])
        ds.add_data(np.ones((5, 2)), np.zeros((5, 1)))
        assert ds.n_samples == 5
        np.testing.assert_allclose(ds["a"], np.ones(5))

    def test_dim_mismatch_raises(self):
        ds = DataSet(["a"], ["y"])
        with pytest.raises(ValueError):
            ds.add_data(np.ones((5, 1)), np.zeros((4, 1)))

    def test_split_and_noise(self):
        ds = DataSet(["a"], ["y"])
        ds.add_data(np.arange(10.0)[:, None], np.arange(10.0)[:, None])
        (Xtr, ytr), (Xte, yte) = ds.train_test_split(test_fraction=0.3, seed=0)
        assert Xtr.shape[0] == 7 and Xte.shape[0] == 3
        before = ds.labels_values.copy()
        ds.add_noise(std=0.1, seed=1)
        assert not np.allclose(before, ds.labels_values)


class TestDataGenerator:
    def _model(self):
        m = Model()
        m.set_dynamical_states("x")
        m.set_inputs("u")
        m.set_dynamical_equations(lambda x, u: -x + u)
        m.setup(dt=0.1, integration_method="rk4")
        m.set_initial_conditions([0.0])
        return m

    def test_random_uniform_run(self):
        gen = DataGenerator(self._model(), steps=50)
        gen.random_uniform(lb=-1, ub=1, hold=5, seed=0)
        ds = gen.run(output="absolute")
        assert ds.n_samples == 50
        assert ds.features == ["x", "u"]
        # one-step consistency: y = x_{k+1}
        x_next = ds.labels_values[:-1, 0]
        x_feat = ds.features_values[1:, 0]
        np.testing.assert_allclose(x_next, x_feat, atol=1e-6)

    def test_difference_quotient(self):
        gen = DataGenerator(self._model(), steps=20)
        gen.chirp(amplitude=0.5, f0=0.05, f1=0.2)
        ds = gen.run(output="difference_quotient")
        # dq should approximate dx/dt = -x + u
        x = ds.features_values[:, 0]
        u = ds.features_values[:, 1]
        dq = ds.labels_values[:, 0]
        np.testing.assert_allclose(dq, -x + u, atol=0.06)

    def test_requires_signal(self):
        gen = DataGenerator(self._model(), steps=10)
        with pytest.raises(RuntimeError, match="input signal"):
            gen.run()

    def test_closed_loop_excitation(self):
        gen = DataGenerator(self._model(), steps=15, x0=[1.0])
        gen.closed_loop(lambda x: -0.5 * x)
        ds = gen.run(output="delta")
        assert ds.n_samples == 15


class TestSeriesIO:
    def test_mat_export(self, tmp_path):
        from scipy.io import loadmat

        from hilo_mpc_tpu.core.series import TimeSeries

        ts = TimeSeries()
        ts.register("x", ["a", "b"])
        ts.append([0.0, 0.1], x=np.array([[1.0, 2.0], [3.0, 4.0]]))
        path = str(tmp_path / "sol.mat")
        ts.to_mat(path)
        data = loadmat(path)
        np.testing.assert_allclose(data["x"], [[1.0, 2.0], [3.0, 4.0]])

    def test_plot_series(self, tmp_path):
        from hilo_mpc_tpu.core.series import TimeSeries
        from hilo_mpc_tpu.utils.plotting import plot_series

        ts = TimeSeries()
        ts.register("x", ["a"])
        ts.register("u", ["v"])
        ts.append([0.0, 0.1, 0.2], x=np.array([[1.0, 2.0, 3.0]]),
                  u=np.array([[0.0, 1.0, 0.0]]))
        fig = plot_series(ts, save_as=str(tmp_path / "p.png"))
        assert (tmp_path / "p.png").exists()

    def test_pgfplots_export(self, tmp_path):
        from hilo_mpc_tpu.core.series import TimeSeries
        from hilo_mpc_tpu.utils.plotting import plot_series, to_pgfplots

        ts = TimeSeries()
        ts.register("x", ["conc_A"])        # underscore must be TeX-escaped
        ts.register("u", ["v"])
        ts.append([0.0, 0.1, 0.2], x=np.array([[1.0, 2.0, 3.0]]),
                  u=np.array([[0.0, 1.0, 0.0]]))
        path = tmp_path / "fig.tex"
        tex = to_pgfplots(ts, str(path), title="run #1")
        assert path.exists()
        assert "\\begin{axis}" in tex and "pgfplots" in tex
        assert "conc\\_A" in tex and "run \\#1" in tex
        assert "(0.1,2)" in tex              # data made it into coordinates
        assert "const plot" in tex           # inputs render as steps
        # fragment mode: no preamble
        frag = to_pgfplots(ts, str(tmp_path / "frag.tex"), standalone=False)
        assert "documentclass" not in frag

        # .tex save_as routes plot_series to the exporter (no figure returned)
        assert plot_series(ts, save_as=str(tmp_path / "via.tex")) is None
        assert (tmp_path / "via.tex").exists()

    def test_plot_backend_dispatch(self):
        import pytest

        from hilo_mpc_tpu import get_plot_backend, set_plot_backend

        set_plot_backend("latex")
        assert get_plot_backend() == "latex"
        with pytest.raises(ImportError, match="bokeh"):
            set_plot_backend("bokeh")    # not installed in this environment
        with pytest.raises(ValueError, match="unknown"):
            set_plot_backend("gnuplot")
        set_plot_backend("matplotlib")

    def test_noise_injection(self):
        from hilo_mpc_tpu.core.series import TimeSeries

        ts = TimeSeries()
        ts.register("y", ["m"])
        ts.append(np.arange(50) * 0.1, y=np.sin(np.arange(50))[None, :])
        noisy = ts.make_some_noise("y", std=0.1, seed=0)
        assert noisy.shape == (1, 50)
        assert not np.allclose(noisy, ts["y"])


class TestAOTExport:
    def test_model_step_roundtrip(self, tmp_path):
        from hilo_mpc_tpu import Model
        from hilo_mpc_tpu.utils.aot import export_model_step, load_function
        import jax.numpy as jnp

        m = Model()
        m.set_dynamical_states("x")
        m.set_inputs("u")
        m.set_dynamical_equations(lambda x, u: -x + u)
        m.setup(dt=0.1, integration_method="rk4")
        path = export_model_step(m, str(tmp_path / "step.bin"))
        fn = load_function(path)
        x1, z1, y1, q1 = fn(jnp.array([1.0], jnp.float32), jnp.zeros(0, jnp.float32),
                            jnp.array([0.0], jnp.float32), jnp.zeros(0, jnp.float32))
        np.testing.assert_allclose(np.asarray(x1)[0], np.exp(-0.1), atol=1e-6)

    def test_nmpc_solver_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from hilo_mpc_tpu import NMPC, Model
        from hilo_mpc_tpu.utils.aot import export_nmpc_solver, load_function

        m = Model()
        m.set_dynamical_states("x")
        m.set_inputs("u")
        m.set_dynamical_equations(lambda x, u: -x + u)
        nmpc = NMPC(m)
        nmpc.horizon = 5
        nmpc.quad_stage_cost.add_states(weights=1.0, ref=[1.0])
        nmpc.quad_stage_cost.add_inputs(weights=0.1)
        nmpc.setup(options={"dt": 0.2})
        path = export_nmpc_solver(nmpc, str(tmp_path / "solver.bin"))
        fn = load_function(path)
        theta = nmpc._assemble_theta(None, None, None)
        dtype = nmpc._solver_dtype
        xs0 = jnp.zeros(1, dtype)
        Xi = jnp.zeros((6, 1), dtype)
        Ui = jnp.zeros((5, 1), dtype)
        X, U, conv, kkt = fn(jnp.asarray(theta, dtype), xs0, Xi, Ui)
        assert bool(conv)
        u_live = nmpc.optimize([0.0])
        np.testing.assert_allclose(np.asarray(U)[0], u_live, atol=1e-8)
