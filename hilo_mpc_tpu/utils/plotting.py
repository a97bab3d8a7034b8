"""Plotting backend dispatch (reference: hilo_mpc/util/plotting.py:27-44 plus the
matplotlib backend, plugins/matplotlib/plot.py). Matplotlib is the supported backend;
'bokeh'/'latex' names are accepted and mapped with a warning (SURVEY.md §7: bokeh/latex
parity is an explicit non-goal)."""
from __future__ import annotations

import warnings
from typing import Optional

_BACKEND = "matplotlib"


def set_plot_backend(backend: Optional[str]):
    global _BACKEND
    if backend is None:
        _BACKEND = None
        return
    backend = backend.lower()
    if backend in ("bokeh", "latex"):
        warnings.warn(f"plot backend {backend!r} is mapped to matplotlib")
        backend = "matplotlib"
    if backend != "matplotlib":
        raise ValueError(f"unknown plot backend {backend!r}")
    _BACKEND = backend


def get_plot_backend() -> Optional[str]:
    return _BACKEND


def plot_series(series, kinds=None, names=None, show: bool = False, save_as=None,
                title: Optional[str] = None):
    """Plot a TimeSeries: one subplot per variable, step plots for inputs."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    t = series["t"]
    kinds = kinds or [k for k in series.kinds if series.names(k)]
    panels = []
    for kind in kinds:
        for nm in series.names(kind):
            if names is not None and nm not in names:
                continue
            panels.append((kind, nm))
    if not panels:
        raise ValueError("nothing to plot")
    fig, axes = plt.subplots(len(panels), 1, sharex=True,
                             figsize=(8, 1.8 * len(panels)), squeeze=False)
    for ax, (kind, nm) in zip(axes[:, 0], panels):
        vals = series[nm].ravel()
        n = min(len(t), len(vals))
        if kind == "u":
            ax.step(t[:n], vals[:n], where="post", label=nm)
        else:
            ax.plot(t[:n], vals[:n], label=nm)
        ax.set_ylabel(nm)
        ax.grid(alpha=0.3)
    axes[-1, 0].set_xlabel(f"time [{series.time_unit}]")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if save_as:
        fig.savefig(save_as, dpi=120)
    if show:
        plt.show()
    return fig
