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

__all__ = ["plot_series_bokeh"]


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
