"""Round-2 breadth: TimeSeries accessor grammar, DataSet/DataGenerator
behavior + error paths, DSL parser error paths (reference style:
construction/validation tests, SURVEY.md §4(a))."""
import numpy as np
import pytest

from hilo_mpc_tpu import DataGenerator, DataSet, Model, TimeSeries
from hilo_mpc_tpu.utils.parsing import parse_equations


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


class TestTimeSeries:
    def _series(self):
        ts = TimeSeries("s")
        ts.register("x", ["a", "b"])
        ts.register("u", ["v"])
        for k in range(4):
            ts.append(0.1 * k, x=[k, 2 * k], u=[-k])
        return ts

    def test_kind_accessor_shape(self):
        ts = self._series()
        assert ts["x"].shape == (2, 4)

    def test_name_accessor(self):
        ts = self._series()
        np.testing.assert_allclose(ts["b"].ravel(), [0, 2, 4, 6])

    def test_final_and_initial_selectors(self):
        ts = self._series()
        np.testing.assert_allclose(ts["x:f"], [3, 6])
        np.testing.assert_allclose(ts["x:0"], [0, 0])

    def test_integer_selector(self):
        ts = self._series()
        np.testing.assert_allclose(ts["x:2"], [2, 4])

    def test_time_axis(self):
        ts = self._series()
        np.testing.assert_allclose(ts["t"], [0.0, 0.1, 0.2, 0.3])

    def test_unknown_key_raises(self):
        ts = self._series()
        with pytest.raises(KeyError):
            ts["nope"]

    def test_get_default(self):
        ts = self._series()
        assert ts.get("nope", 42) == 42

    def test_append_unknown_kind_raises(self):
        ts = self._series()
        with pytest.raises(KeyError, match="registered"):
            ts.append(1.0, z=[1.0])

    def test_unmentioned_kind_padded_with_nan(self):
        ts = self._series()
        ts.append(0.4, x=[9, 9])
        assert np.isnan(ts["u"][0, -1])

    def test_reset_clears_samples(self):
        ts = self._series()
        ts.reset()
        assert ts.n_samples == 0 and len(ts) == 0

    def test_copy_is_independent(self):
        ts = self._series()
        c = ts.copy()
        c.append(0.4, x=[5, 5], u=[0.0])
        assert ts.n_samples == 4 and c.n_samples == 5

    def test_sort_by_time(self):
        ts = TimeSeries("s")
        ts.register("x", ["a"])
        for t in (0.3, 0.1, 0.2):
            ts.append(t, x=[t])
        ts.sort("t")
        np.testing.assert_allclose(ts["t"], [0.1, 0.2, 0.3])

    def test_make_some_noise_returns_noisy_copy(self):
        ts = self._series()
        before = ts["x"].copy()
        noisy = ts.make_some_noise(kind="x", std=0.5, seed=1)
        assert not np.allclose(noisy, before)
        np.testing.assert_allclose(ts["x"], before)  # original untouched

    def test_to_mat_roundtrip(self, tmp_path):
        from scipy.io import loadmat

        ts = self._series()
        path = str(tmp_path / "sol.mat")
        ts.to_mat(path)
        data = loadmat(path)
        np.testing.assert_allclose(np.asarray(data["x"]), ts["x"])


class TestDataSet:
    def test_row_mismatch_rejected(self):
        ds = DataSet(["x1"], ["y1"])
        with pytest.raises(ValueError, match="rows"):
            ds.add_data(np.zeros((2, 5)), np.zeros((1, 5)))

    def test_named_column_access(self):
        ds = DataSet(["x1", "x2"], ["y1"])
        ds.add_data(np.arange(10).reshape(2, 5), np.ones((1, 5)))
        np.testing.assert_allclose(ds["x2"].ravel(), [5, 6, 7, 8, 9])

    def test_unknown_name_raises(self):
        ds = DataSet(["x1"], ["y1"])
        ds.add_data(np.zeros((1, 3)), np.zeros((1, 3)))
        with pytest.raises(KeyError):
            ds["zz"]

    def test_train_test_split_fraction(self):
        ds = DataSet(["x1"], ["y1"])
        ds.add_data(np.arange(10)[None, :], np.arange(10)[None, :])
        (Xtr, ytr), (Xte, yte) = ds.train_test_split(test_fraction=0.3, seed=0)
        assert Xte.shape[0] == 3 and Xtr.shape[0] == 7
        assert yte.shape[0] == 3 and ytr.shape[0] == 7

    def test_add_noise_labels_only(self):
        ds = DataSet(["x1"], ["y1"])
        ds.add_data(np.zeros((1, 50)), np.zeros((1, 50)))
        ds.add_noise(std=0.1, seed=0, what="labels")
        assert np.allclose(ds.features_values, 0.0)
        assert not np.allclose(ds.labels_values, 0.0)

    def test_append_and_copy(self):
        a = DataSet(["x"], ["y"])
        a.add_data(np.zeros((1, 2)), np.zeros((1, 2)))
        b = a.copy()
        b.add_data(np.ones((1, 3)), np.ones((1, 3)))
        a.append(b)
        assert a.n_samples == 7 and b.n_samples == 5


class TestDataGenerator:
    def _gen(self, steps=30):
        m = pendulum()
        m.setup(dt=0.05, integration_method="rk4")
        return DataGenerator(m, steps=steps, x0=[0.2, 0.0])

    def test_requires_setup_model(self):
        with pytest.raises(RuntimeError, match="set up"):
            DataGenerator(pendulum(), steps=10)

    def test_run_before_signal_design(self):
        g = self._gen()
        with pytest.raises(RuntimeError, match="signal"):
            g.run()

    def test_random_uniform_bounds_and_hold(self):
        g = self._gen()
        g.random_uniform(lb=-0.5, ub=0.5, hold=5, seed=0)
        U = g._U
        assert U.min() >= -0.5 and U.max() <= 0.5
        np.testing.assert_allclose(U[0], U[4])  # held for 5 samples

    def test_chirp_kinds(self):
        g = self._gen()
        for kind in ("linear", "exponential", "hyperbolic"):
            g.chirp(amplitude=0.3, f0=0.02, f1=0.3, kind=kind)
        with pytest.raises(ValueError, match="chirp"):
            g.chirp(kind="bogus")

    def test_output_modes(self):
        for mode in ("absolute", "delta", "difference_quotient"):
            g = self._gen()
            g.random_uniform(seed=1)
            ds = g.run(output=mode)
            assert ds.n_samples > 0
        g = self._gen()
        g.random_uniform(seed=1)
        with pytest.raises(ValueError, match="output"):
            g.run(output="bogus")

    def test_delta_mode_is_state_difference(self):
        g = self._gen(steps=10)
        g.random_uniform(seed=2)
        ds_abs = g.run(output="absolute")
        g2 = self._gen(steps=10)
        g2.random_uniform(seed=2)
        ds_del = g2.run(output="delta")
        # delta labels = successive differences of the absolute trajectory
        # (samples on axis 0: ld[k] = la[k] - la[k-1] once both windows overlap)
        la, ld = ds_abs.labels_values, ds_del.labels_values
        np.testing.assert_allclose(ld[1:], np.diff(la, axis=0), atol=1e-6)


class TestParserErrors:
    def test_unparsable_line(self):
        with pytest.raises(ValueError, match="parse"):
            parse_equations("dx/dt == = 1")

    def test_mixed_discrete_continuous(self):
        with pytest.raises(ValueError, match="mix"):
            parse_equations("dx/dt = -x(t)\ny(k+1) = y(k)")

    def test_declared_state_without_equation(self):
        with pytest.raises(ValueError, match="no equation"):
            parse_equations("dx/dt = -x(t)", known_states=["x", "z"])

    def test_circular_aux_definitions(self):
        with pytest.raises(ValueError, match="circular"):
            parse_equations("dx/dt = a\na = b\nb = a")

    def test_unsupported_syntax_rejected(self):
        with pytest.raises(ValueError, match="parse|syntax"):
            parse_equations("dx/dt = __import__('os').getpid()")

    def test_valid_model_parses(self):
        res = parse_equations("dx/dt = -k*x(t) + u(k)\ny(k) = x(t)")
        assert res is not None


class TestSeriesMergeInterp:
    """Round-5: Series merge/interpolation + OptimizationSeries (reference:
    modules/base.py:2157, 3720 — the VERDICT r3 'Series niceties' gap)."""

    def _ts(self, t0=0.0, n=5):
        ts = TimeSeries("s")
        ts.register("x", ["a", "b"])
        for k in range(n):
            ts.append(t0 + 0.1 * k, x=[k, 2.0 * k])
        return ts

    def test_interpolate_midpoints(self):
        ts = self._ts()
        out = ts.interpolate([0.05, 0.25])
        np.testing.assert_allclose(out["x"],
                                   [[0.5, 2.5], [1.0, 5.0]], atol=1e-12)
        np.testing.assert_allclose(out["t"], [0.05, 0.25])

    def test_interpolate_kind_returns_array(self):
        ts = self._ts()
        arr = ts.interpolate([0.15], kind="x")
        np.testing.assert_allclose(arr, [[1.5], [3.0]])

    def test_interpolate_skips_nan_gaps(self):
        ts = TimeSeries("s")
        ts.register("x", ["a"])
        ts.register("u", ["v"])
        ts.append(0.0, x=[0.0], u=[1.0])
        ts.append(0.1, x=[1.0])            # u not logged -> NaN gap
        ts.append(0.2, x=[2.0], u=[3.0])
        out = ts.interpolate([0.1])
        np.testing.assert_allclose(out["x"], [[1.0]])
        # u interpolates across its own valid samples (0.0 and 0.2)
        np.testing.assert_allclose(out["u"], [[2.0]])

    def test_merge_union_of_kinds(self):
        a = self._ts()
        b = TimeSeries("s")
        b.register("y", ["m"])
        for k in range(3):
            b.append(0.05 + 0.1 * k, y=[10.0 + k])
        out = a.merge(b)
        assert out.n_samples == 8
        assert set(out.kinds) == {"x", "y"}
        assert np.all(np.diff(out["t"]) >= 0)
        # a's kinds are NaN at b's instants and vice versa
        assert np.isnan(out["y"]).sum() == 2 * 0 + 5
        assert np.isnan(out["x"]).sum() == 2 * 3

    def test_merge_interpolate_fills(self):
        a = self._ts()
        b = TimeSeries("s")
        b.register("y", ["m"])
        b.append(0.0, y=[0.0])
        b.append(0.4, y=[4.0])
        out = a.merge(b, interpolate=True)
        y = out["y"].ravel()
        t = out["t"]
        np.testing.assert_allclose(y, 10.0 * t, atol=1e-12)

    def test_merge_conflicting_names_raises(self):
        a = self._ts()
        b = TimeSeries("s")
        b.register("x", ["other", "names"])
        b.append(0.0, x=[0.0, 0.0])
        with pytest.raises(ValueError, match="different variables"):
            a.merge(b)

    def test_optimization_series(self):
        from hilo_mpc_tpu import OptimizationSeries

        os_ = OptimizationSeries("s")
        os_.register("u", ["v"])
        os_.append(0.0, u=[1.0], stats=[4, 1e-9, 2.5, 1.0])
        os_.append(0.1, u=[2.0], stats=[6, 1e-8, 3.5, 0.0])
        np.testing.assert_allclose(os_.iterations, [4, 6])
        np.testing.assert_allclose(os_.solve_times_ms, [2.5, 3.5])
        assert os_.convergence_rate == 0.5

    def test_adopt_controller_solution(self):
        from hilo_mpc_tpu import OptimizationSeries

        ts = TimeSeries("h")
        ts.register("x", ["a"])
        ts.append(0.0, x=[1.0])
        out = OptimizationSeries.adopt(ts)
        assert "stats" in out.kinds
        assert np.isnan(out.convergence_rate)
