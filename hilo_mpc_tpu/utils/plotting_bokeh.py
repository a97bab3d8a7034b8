"""Bokeh plot backend: interactive HTML rendering of TimeSeries.

Reference: hilo_mpc/plugins/bokeh/plot.py (1,225 LoC bokeh backend,
line/step panels per variable, interactive output) dispatched through
the plugin manager (plugins/plugins.py). Here the same capability is a
single module: one bokeh figure per variable, ``step`` glyphs for
inputs, a linked-x column layout, save-to-HTML and/or show. Imports
are function-local so the module itself imports fine without bokeh and
the backend gate (`set_plot_backend('bokeh')`) raises the clear error.

The glyph surface used is deliberately small and stable across bokeh
2.x and 3.x: ``figure``, ``fig.line``, ``fig.step``, ``column``,
``output_file``, ``save``, ``show``.
"""
from __future__ import annotations

from typing import Optional

__all__ = ["plot_series_bokeh", "LiveBokehLoopPlot"]


def _require_bokeh():
    try:
        from bokeh import io as bio
        from bokeh import plotting as bplt
        from bokeh.layouts import column
    except ImportError as e:  # pragma: no cover - exercised via stub in tests
        raise ImportError(
            "plot backend 'bokeh' requires the bokeh package, which is not "
            "installed; use 'matplotlib' (rendering) or 'latex' (pgfplots "
            "export)") from e
    return bio, bplt, column


def plot_series_bokeh(series, kinds=None, names=None, show: bool = False,
                      save_as=None, title: Optional[str] = None):
    """Render a TimeSeries with bokeh: one figure per variable, shared x.

    Returns the bokeh layout object (a ``column`` of figures). With
    ``save_as='file.html'`` the layout is written as a standalone
    interactive HTML document; ``show=True`` opens it in a browser.
    """
    import numpy as np

    from .plotting import _collect_panels

    bio, bplt, column = _require_bokeh()

    t = np.asarray(series["t"], dtype=float)
    panels = _collect_panels(series, kinds, names)
    figs = []
    for kind, nm in panels:
        vals = np.asarray(series[nm], dtype=float).ravel()
        n = min(len(t), len(vals))
        fig = bplt.figure(
            height=180, width=640,
            x_axis_label=f"time [{series.time_unit}]", y_axis_label=nm,
            title=title if (title and not figs) else None)
        if kind == "u":
            # piecewise-constant inputs: hold each value to the next sample
            fig.step(t[:n], vals[:n], mode="after", line_width=2,
                     legend_label=nm)
        else:
            fig.line(t[:n], vals[:n], line_width=2, legend_label=nm)
        if figs:  # link the x ranges so panning stays aligned
            fig.x_range = figs[0].x_range
        figs.append(fig)
    layout = column(figs)
    if save_as:
        bio.output_file(str(save_as), title=title or "hilo_mpc_tpu")
        bio.save(layout)
    if show:  # pragma: no cover - needs a browser
        bio.show(layout)
    return layout


class LiveBokehLoopPlot:
    """Live closed-loop animation on the bokeh backend.

    Bokeh-side analogue of the reference's live loop animation
    (reference: hilo_mpc/modules/control_loop.py:202-285, where a bokeh
    server pushes ColumnDataSource updates from a periodic callback).
    Two delivery modes:

    - ``mode='save'`` (default, headless-safe): each ``update()`` streams the
      newest samples into per-panel ``ColumnDataSource``s and re-saves a
      standalone HTML document whose ``<meta http-equiv="refresh">`` header
      makes any open browser tab poll the file — a serverless equivalent of
      the reference's push loop.
    - ``mode='server'``: a ``bokeh.server.server.Server`` app owns the
      figures; ``update()`` enqueues the new samples and a periodic callback
      inside the bokeh document streams them (the reference's architecture).
      The tornado IOLoop runs on a daemon thread so the control loop stays in
      the caller's thread.

    The data path is ``source.stream(new_rows)`` in both modes, so panels
    grow incrementally instead of being redrawn.
    """

    def __init__(self, series, save_as="live_loop.html", mode: str = "save",
                 refresh_s: float = 1.0, port: int = 5006, kinds=None):
        import numpy as np

        from .plotting import _collect_panels

        bio, bplt, column = _require_bokeh()
        from bokeh.models import ColumnDataSource

        if mode not in ("save", "server"):
            raise ValueError(f"unknown live-plot mode {mode!r} "
                             "(expected 'save' or 'server')")
        self._np = np
        self._bio, self._bplt, self._column = bio, bplt, column
        self._series = series
        self._save_as = str(save_as)
        self._mode = mode
        self._refresh_s = float(refresh_s)
        self._n_sent = None  # per-panel samples already streamed
        self.n_draws = 0

        self._panels = _collect_panels(series, kinds, None)
        self._sources, figs = [], []
        for kind, nm in self._panels:
            src = ColumnDataSource(data={"t": [], "v": []})
            fig = bplt.figure(height=180, width=640,
                              x_axis_label=f"time [{series.time_unit}]",
                              y_axis_label=nm)
            if kind == "u":
                fig.step("t", "v", source=src, mode="after", line_width=2)
            else:
                fig.line("t", "v", source=src, line_width=2)
            if figs:
                fig.x_range = figs[0].x_range
            self._sources.append(src)
            figs.append(fig)
        self._figs = figs
        self.layout = column(figs)
        if mode == "server":  # pragma: no cover - needs bokeh+tornado
            self._start_server(port)

    # -- data path ---------------------------------------------------------
    def _new_rows(self):
        np = self._np
        t = np.asarray(self._series["t"], dtype=float).ravel()
        if self._n_sent is None:
            self._n_sent = [0] * len(self._panels)
        rows = []
        # panels may grow at different rates (a series appended less often);
        # a per-panel sent counter keeps each stream gapless and duplicate-free
        for j, (kind, nm) in enumerate(self._panels):
            v = np.asarray(self._series[nm], dtype=float).ravel()
            lo = self._n_sent[j]
            hi = min(len(t), len(v))
            rows.append({"t": list(t[lo:hi]), "v": list(v[lo:hi])})
            self._n_sent[j] = max(lo, hi)
        return rows

    def update(self):
        rows = self._new_rows()
        if self._mode == "server":  # pragma: no cover - needs bokeh+tornado
            self._queue.put(rows)
        else:
            for src, new in zip(self._sources, rows):
                if new["t"]:
                    src.stream(new)
            self._save_html()
        self.n_draws += 1

    def _save_html(self):
        self._bio.output_file(self._save_as, title="hilo_mpc_tpu live loop")
        self._bio.save(self.layout)
        self._inject_refresh()

    def _inject_refresh(self):
        # standalone bokeh documents are static; an http-refresh header turns
        # the saved file into a polling live view (serverless push analogue)
        try:
            with open(self._save_as, "r+", encoding="utf-8") as fh:
                html = fh.read()
                tag = f'<meta http-equiv="refresh" content="{self._refresh_s}">'
                if tag not in html and "<head>" in html:
                    fh.seek(0)
                    fh.write(html.replace("<head>", "<head>\n  " + tag, 1))
                    fh.truncate()
        except OSError:  # stubbed save may not create a real file
            pass

    # -- server mode -------------------------------------------------------
    def _start_server(self, port):  # pragma: no cover - needs bokeh+tornado
        import queue
        import threading

        from bokeh.server.server import Server

        self._queue = queue.Queue()

        def app(doc):
            doc.add_root(self.layout)

            def tick():
                try:
                    while True:
                        rows = self._queue.get_nowait()
                        for src, new in zip(self._sources, rows):
                            if new["t"]:
                                src.stream(new)
                except queue.Empty:
                    pass

            doc.add_periodic_callback(tick, max(50, int(self._refresh_s * 1e3)))

        self._server = Server({"/": app}, port=port, num_procs=1)
        self._server.start()
        self._thread = threading.Thread(target=self._server.io_loop.start,
                                        daemon=True)
        self._thread.start()

    def finish(self):
        if self._mode == "save":
            self._save_html()
        else:  # pragma: no cover - needs bokeh+tornado
            self._server.io_loop.add_callback(self._server.io_loop.stop)
