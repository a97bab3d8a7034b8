"""Bokeh backend tests — exercised against a recording stub of bokeh's API.

bokeh is an optional dependency (not installed in this image), so like
the reference's plugin tests we validate our side of the contract: the
backend builds one figure per variable, uses step glyphs for inputs and
line glyphs elsewhere, links x ranges, and drives output_file/save for
HTML export. The stub implements exactly the public surface the backend
declares it uses (figure/line/step/column/output_file/save/show).
Reference: hilo_mpc/plugins/bokeh/plot.py, plugins/plugins.py.
"""
import sys
import types

import numpy as np
import pytest


class _FigStub:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.calls = []
        self.layouts = []
        self.x_range = object()

    def line(self, x, y, **kw):
        self.calls.append(("line", x, y, kw))

    def step(self, x, y, **kw):
        self.calls.append(("step", x, y, kw))

    def varea(self, x=None, y1=None, y2=None, **kw):
        self.calls.append(("varea", x, (y1, y2), kw))

    def scatter(self, x, y, **kw):
        self.calls.append(("scatter", x, y, kw))

    def add_layout(self, obj):
        self.layouts.append(obj)


class _SpanStub:
    def __init__(self, **kw):
        self.kw = kw


class _SourceStub:
    """Records ColumnDataSource.stream calls like bokeh's CDS."""

    def __init__(self, data=None):
        self.data = {k: list(v) for k, v in (data or {}).items()}
        self.streamed = []

    def stream(self, new, rollover=None):
        self.streamed.append(new)
        for k, v in new.items():
            self.data.setdefault(k, []).extend(v)


@pytest.fixture
def stub_bokeh(monkeypatch):
    rec = {"figs": [], "saved": [], "outfile": [], "shown": []}

    bokeh = types.ModuleType("bokeh")
    bio = types.ModuleType("bokeh.io")
    bplt = types.ModuleType("bokeh.plotting")
    blay = types.ModuleType("bokeh.layouts")
    bmod = types.ModuleType("bokeh.models")

    def figure(**kw):
        f = _FigStub(**kw)
        rec["figs"].append(f)
        return f

    def save(layout):
        rec["saved"].append(layout)
        if rec["outfile"]:  # emulate bokeh writing a standalone document
            with open(rec["outfile"][-1], "w", encoding="utf-8") as fh:
                fh.write("<html><head></head><body>doc</body></html>")

    bplt.figure = figure
    blay.column = lambda children: ("column", list(children))
    bio.output_file = lambda path, **kw: rec["outfile"].append(path)
    bio.save = save
    bio.show = lambda layout: rec["shown"].append(layout)
    bmod.ColumnDataSource = _SourceStub
    bmod.Span = _SpanStub
    bokeh.io = bio
    bokeh.plotting = bplt
    bokeh.layouts = blay
    bokeh.models = bmod

    for name, mod in [("bokeh", bokeh), ("bokeh.io", bio),
                      ("bokeh.plotting", bplt), ("bokeh.layouts", blay),
                      ("bokeh.models", bmod)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return rec


def _sim_series():
    from hilo_mpc_tpu import Model

    model = Model()
    model.set_inputs("u")
    model.set_equations("dx/dt = -x + u")
    model.setup(dt=0.1)
    model.set_initial_conditions([1.0])
    model.simulate(u=np.full((20, 1), 0.5), steps=20)
    return model.solution


def test_backend_gate_without_bokeh():
    from hilo_mpc_tpu.utils.plotting import get_plot_backend, set_plot_backend

    if "bokeh" in sys.modules and not isinstance(
            sys.modules["bokeh"], types.ModuleType):
        pytest.skip("unexpected bokeh state")
    try:
        import bokeh  # noqa: F401
        pytest.skip("real bokeh installed")
    except ImportError:
        pass
    prev = get_plot_backend()
    try:
        with pytest.raises(ImportError, match="bokeh"):
            set_plot_backend("bokeh")
        assert get_plot_backend() == prev  # gate must not half-switch
    finally:
        set_plot_backend(prev)


def test_bokeh_plot_series(stub_bokeh):
    from hilo_mpc_tpu.utils.plotting import set_plot_backend

    series = _sim_series()
    prev = "matplotlib"
    set_plot_backend("bokeh")
    try:
        from hilo_mpc_tpu.utils.plotting import plot_series

        layout = plot_series(series, kinds=["x", "u"], title="closed loop")
    finally:
        set_plot_backend(prev)
    kind, children = layout
    assert kind == "column"
    assert len(children) == 2  # one panel per variable (x, u)
    fx, fu = stub_bokeh["figs"]
    assert fx.calls[0][0] == "line"   # states: line glyph
    assert fu.calls[0][0] == "step"   # inputs: piecewise-constant step glyph
    assert fu.calls[0][3].get("mode") == "after"
    # data lengths consistent with the time grid
    assert len(fx.calls[0][1]) == len(fx.calls[0][2])
    # linked x ranges for aligned panning
    assert fu.x_range is fx.x_range
    assert not stub_bokeh["saved"]


def test_bokeh_overlays(stub_bokeh):
    # overlay parity with the reference bokeh plugin: references, bounds,
    # predictions and fill-between bands (reference: bokeh/plot.py:281-355)
    from hilo_mpc_tpu.utils.plotting_bokeh import plot_series_bokeh

    series = _sim_series()
    t = np.asarray(series["t"], dtype=float)
    layout = plot_series_bokeh(
        series, kinds=["x", "u"],
        refs={"x": 0.5},
        bounds={"u": (-1.0, 1.0)},
        predictions={"x": (t[-5:] + 0.1, np.linspace(0.5, 0.6, 5))},
        bands={"x": (t, np.zeros(t.size), np.full(t.size, 0.1))})
    assert layout[0] == "column"
    fx, fu = stub_bokeh["figs"]
    kinds_x = [c[0] for c in fx.calls]
    assert kinds_x.count("line") == 3      # data + dashed ref + prediction
    assert "varea" in kinds_x              # fill-between band
    # the band is drawn first so data lines sit on top
    assert kinds_x[0] == "varea"
    dashes = [c[3].get("line_dash") for c in fx.calls if c[0] == "line"]
    assert "dashed" in dashes
    kinds_u = [c[0] for c in fu.calls]
    assert kinds_u.count("line") == 2      # lb + ub dotted bound lines
    u_dashes = [c[3].get("line_dash") for c in fu.calls if c[0] == "line"]
    assert u_dashes == ["dotted", "dotted"]


def test_bokeh_plot_prediction(stub_bokeh):
    from hilo_mpc_tpu.utils.plotting import set_plot_backend

    from hilo_mpc_tpu import NMPC
    from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz

    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = 5
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0],
                                    ref=[0.3, 0.18055])
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_parameters([1.0] * 6)
    nmpc.setup(options={"dt": 0.1})
    nmpc.optimize([0.2, 0.1])
    set_plot_backend("bokeh")
    try:
        layout = nmpc.plot_prediction(
            extras={"x_1": np.full(6, 0.3)}, extras_names=["measured"])
    finally:
        set_plot_backend("matplotlib")
    assert layout[0] == "column"
    assert len(layout[1]) == 3  # 2 states + 1 input panel
    f0 = stub_bokeh["figs"][0]
    labels = [c[3].get("legend_label") for c in f0.calls]
    assert "prediction" in labels and "measured" in labels
    # the overlay extra is dashed, like the matplotlib backend
    dashes = [c[3].get("line_dash") for c in f0.calls]
    assert "dashed" in dashes


def test_bokeh_gp_band(stub_bokeh):
    from hilo_mpc_tpu import GaussianProcess
    from hilo_mpc_tpu.utils.plotting_bokeh import plot_gp_bokeh

    rng = np.random.default_rng(0)
    X = np.linspace(0, 3, 12)[:, None]
    y = np.sin(X[:, 0]) + 0.05 * rng.standard_normal(12)
    gp = GaussianProcess(["x"], ["y"])
    gp.set_training_data(X, y)
    gp.setup()
    layout = plot_gp_bokeh(gp, np.linspace(0, 3, 30), save_as=None)
    assert layout[0] == "column"
    fig = stub_bokeh["figs"][-1]
    kinds = [c[0] for c in fig.calls]
    assert kinds[0] == "varea"           # quantile band under the mean
    assert "line" in kinds and "scatter" in kinds
    # band ordering: y1 <= y2 everywhere
    _, _, (lo, hi), _ = fig.calls[0]
    assert np.all(np.asarray(lo) <= np.asarray(hi))
    with pytest.raises(ValueError, match="1-D"):
        plot_gp_bokeh(gp, np.zeros((4, 2)))


def test_live_loop_span_overlays(stub_bokeh):
    from hilo_mpc_tpu.utils.plotting_bokeh import LiveBokehLoopPlot

    series = _sim_series()
    live = LiveBokehLoopPlot(series, refs={"x": 0.5},
                             bounds={"u": (-1.0, 1.0)})
    by_label = {f.kwargs.get("y_axis_label"): f for f in stub_bokeh["figs"]}
    fx, fu = by_label["x"], by_label["u"]
    assert len(fx.layouts) == 1
    assert fx.layouts[0].kw["location"] == 0.5
    assert fx.layouts[0].kw["line_dash"] == "dashed"
    assert len(fu.layouts) == 2
    assert sorted(s.kw["location"] for s in fu.layouts) == [-1.0, 1.0]
    assert all(s.kw["line_dash"] == "dotted" for s in fu.layouts)
    live.update()
    assert live.n_draws == 1


def test_bokeh_html_export(stub_bokeh, tmp_path):
    series = _sim_series()
    out = str(tmp_path / "loop.html")
    # .html save_as routes to the bokeh backend even from the default backend
    fig = series.plot(save_as=out)
    assert stub_bokeh["outfile"] == [out]
    assert stub_bokeh["saved"] == [fig]


class TestLiveBokehLoop:
    """Live loop animation on the bokeh backend (reference:
    hilo_mpc/modules/control_loop.py:202-285 — bokeh server streaming
    ColumnDataSource updates per step)."""

    def test_streams_incrementally_and_saves_refresh_html(self, stub_bokeh,
                                                          tmp_path):
        from hilo_mpc_tpu.utils.plotting_bokeh import LiveBokehLoopPlot

        series = _sim_series()
        out = tmp_path / "live.html"
        live = LiveBokehLoopPlot(series, save_as=out, refresh_s=0.5,
                                 kinds=["x", "u"])
        # figures drive glyphs from named CDS columns
        fx, fu = stub_bokeh["figs"]
        assert fx.calls[0][:3] == ("line", "t", "v")
        assert fu.calls[0][0] == "step" and fu.calls[0][3]["mode"] == "after"
        assert fu.x_range is fx.x_range

        live.update()          # first update streams the whole history
        n = series.n_samples
        src_x = live._sources[0]
        assert len(src_x.streamed) == 1
        assert len(src_x.data["t"]) == n
        # append two samples -> only the delta is streamed
        series.append([series["t"][-1] + 0.1, series["t"][-1] + 0.2],
                      x=np.array([[0.3, 0.2]]), u=np.array([[0.5, 0.5]]))
        live.update()
        assert len(src_x.streamed) == 2
        assert len(src_x.streamed[-1]["t"]) == 2
        np.testing.assert_allclose(src_x.data["v"],
                                   np.asarray(series["x"][0], dtype=float))
        live.finish()
        html = out.read_text()
        assert 'http-equiv="refresh" content="0.5"' in html

    def test_control_loop_dispatches_to_bokeh(self, stub_bokeh, tmp_path,
                                              monkeypatch):
        from hilo_mpc_tpu import Model, SimpleControlLoop

        monkeypatch.chdir(tmp_path)  # default save_as lands in cwd
        plant = Model()
        plant.set_inputs("u")
        plant.set_equations("dx/dt = -x + u")
        plant.setup(dt=0.1)
        plant.set_initial_conditions([1.0])
        loop = SimpleControlLoop(plant, lambda x: -0.5 * np.asarray(x))
        loop.run(3, live_plot="bokeh")
        assert stub_bokeh["figs"], "bokeh live plot was not constructed"
        assert (tmp_path / "live_loop.html").exists()

    def test_live_mode_validation(self, stub_bokeh):
        from hilo_mpc_tpu.utils.plotting_bokeh import LiveBokehLoopPlot

        series = _sim_series()
        with pytest.raises(ValueError, match="mode"):
            LiveBokehLoopPlot(series, mode="websocket")


def test_series_plot_method_matplotlib(tmp_path):
    # TimeSeries.plot (reference: Series.plot, base.py:3458) renders via mpl
    series = _sim_series()
    out = str(tmp_path / "loop.png")
    fig = series.plot(save_as=out)
    assert fig is not None
    import os

    assert os.path.getsize(out) > 0
