"""Shared styling for the example-gallery figures (tools/render_examples.py).

Light-mode reference palette (categorical slots in fixed order, recessive
grid/axes, text never in series colors). Figures are only produced when the
renderer sets HILO_EXAMPLES_OUT; the examples guard their plotting blocks on
that variable so normal runs stay plot-free.
"""
import os

SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]  # slots 1-4 (light)
TEXT = "#0b0b0b"
MUTED = "#52514e"
GRID = "#e4e3df"
SURFACE = "#fcfcfb"


def out_dir():
    return os.environ.get("HILO_EXAMPLES_OUT")


def new_fig(nrows=1, ncols=1, height=2.9, width=6.8):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(width * ncols, height * nrows),
                             facecolor=SURFACE, squeeze=False)
    return fig, axes


def style(ax, title=None, xlabel=None, ylabel=None):
    ax.set_facecolor(SURFACE)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
        ax.spines[s].set_linewidth(0.8)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    ax.tick_params(colors=MUTED, labelsize=8)
    if title:
        ax.set_title(title, color=TEXT, fontsize=10, loc="left")
    if xlabel:
        ax.set_xlabel(xlabel, color=MUTED, fontsize=8)
    if ylabel:
        ax.set_ylabel(ylabel, color=MUTED, fontsize=8)


def legend(ax):
    leg = ax.legend(fontsize=8, frameon=False, labelcolor=TEXT)
    return leg


def save(fig, name):
    import matplotlib.pyplot as plt

    fig.tight_layout()
    fig.savefig(os.path.join(out_dir(), name), dpi=115,
                facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)
