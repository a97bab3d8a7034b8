"""Closed-loop orchestration of plant + controller + observer.

Rebuild of the reference's SimpleControlLoop (reference: hilo_mpc/modules/
control_loop.py:43-455): steps the plant with the controller's move and feeds the
observer's estimate back. Controllers: NMPC/LMPC/OCP (optimize), PID/LQR (call), or any
callable (e.g. a trained ANN policy). Observers: MHE/KF/EKF/UKF/PF. Name-based index
maps between plant and controller models mirror control_loop.py:76-91.
"""
from __future__ import annotations


import numpy as np

from .core.model import Model
from .core.series import TimeSeries


class _LiveLoopPlot:
    """Incremental closed-loop figure, redrawn after every step.

    Matplotlib analogue of the reference's live animation
    (reference: control_loop.py:202-285 — bokeh periodic-callback server /
    mpl animation). One panel per plant state/input; lines are updated in
    place and the canvas flushed with a short ``plt.pause`` so the figure
    animates in interactive backends and is a no-op-safe redraw under Agg.
    """

    def __init__(self, solution, pause: float = 1e-3, refs=None, bounds=None):
        import matplotlib.pyplot as plt

        self._plt = plt
        self._solution = solution
        self._pause = pause
        panels = [("x", nm, i) for i, nm in enumerate(solution.names("x"))]
        panels += [("u", nm, i) for i, nm in enumerate(solution.names("u"))]
        self._panels = panels
        was_interactive = plt.isinteractive()
        plt.ion()
        self._was_interactive = was_interactive
        self.fig, axes = plt.subplots(len(panels), 1, sharex=True,
                                      figsize=(8, 2.0 * len(panels)),
                                      squeeze=False)
        self._axes = axes.ravel()
        self._lines = []
        for ax, (kind, nm, _) in zip(self._axes, panels):
            style = dict(drawstyle="steps-post") if kind == "u" else {}
            (line,) = ax.plot([], [], "-o", ms=3, **style)
            ax.set_ylabel(nm)
            # static overlays, same contract as the bokeh live backend
            if refs and nm in refs:
                ax.axhline(float(np.asarray(refs[nm]).ravel()[0]),
                           ls="--", lw=1.2, color="tab:green")
            if bounds and nm in bounds:
                for v in bounds[nm]:
                    if v is not None and np.all(np.isfinite(v)):
                        ax.axhline(float(np.asarray(v).ravel()[0]),
                                   ls=":", lw=1.2, color="tab:red")
            self._lines.append(line)
        self._axes[-1].set_xlabel("t")
        self.n_draws = 0

    def update(self):
        t = np.asarray(self._solution["t"]).ravel()
        for line, ax, (kind, nm, i) in zip(self._lines, self._axes,
                                           self._panels):
            ys = np.asarray(self._solution[kind])[i]
            line.set_data(t[: ys.size], ys)
            ax.relim()
            ax.autoscale_view()
        self.fig.canvas.draw_idle()
        self._plt.pause(self._pause)
        self.n_draws += 1

    def finish(self):
        if not self._was_interactive:
            self._plt.ioff()


def _make_live_plotter(solution, live_plot, **kwargs):
    """Live-plot dispatch: ``True`` follows the active plot backend; the
    strings 'matplotlib' / 'bokeh' select explicitly (reference: the loop
    animation honors the selected plot plugin, control_loop.py:202-285)."""
    if not live_plot:
        return None
    from .utils.plotting import get_plot_backend

    backend = (live_plot if isinstance(live_plot, str)
               else (get_plot_backend() or "matplotlib"))
    if backend == "bokeh":
        from .utils.plotting_bokeh import LiveBokehLoopPlot

        return LiveBokehLoopPlot(solution, **kwargs)
    mpl_kwargs = {k: kwargs.pop(k) for k in ("refs", "bounds", "pause")
                  if k in kwargs}
    if kwargs:
        import warnings

        warnings.warn(
            "these live_plot_kwargs are only used by the bokeh live "
            f"backend; ignored on matplotlib: {sorted(kwargs)}", stacklevel=3)
    return _LiveLoopPlot(solution, **mpl_kwargs)


class SimpleControlLoop:
    def __init__(self, plant: Model, controller, observer=None):
        if not plant.is_setup():
            raise RuntimeError("plant must be set up (plant.setup(dt=...)) before "
                               "building the loop")
        self._plant = plant
        self._controller = controller
        self._observer = observer
        self._rti = False
        self._rti_skipped_prepare = False

        # name-based mapping: controller model states -> plant state indices
        self._ctrl_idx = None
        ctrl_model = getattr(controller, "_model", None)
        if ctrl_model is not None and hasattr(ctrl_model, "dynamical_states"):
            plant_states = plant.dynamical_states
            try:
                self._ctrl_idx = [plant_states.index(n)
                                  for n in ctrl_model.dynamical_states]
            except ValueError:
                self._ctrl_idx = None  # different naming: pass full state
        self.solution = TimeSeries(plant.time_unit)
        self.solution.register("x", plant.dynamical_states)
        self.solution.register("u", plant.inputs)
        self.solution.register("y", plant.measurements)

    def _control(self, x0, k, last=False, **kwargs):
        c = self._controller
        if self._rti and hasattr(c, "rti_feedback"):
            x_c = x0 if self._ctrl_idx is None else x0[self._ctrl_idx]
            if c._rti is None or self._rti_skipped_prepare:
                c.rti_prepare(x_pred=x_c, **kwargs)
                self._rti_skipped_prepare = False
            u = np.atleast_1d(np.asarray(c.rti_feedback(x_c)))
            if last:
                # the trailing solve-ahead would be discarded; a subsequent
                # run() re-prepares at the state it actually observes
                self._rti_skipped_prepare = True
            else:
                c.rti_prepare(**kwargs)   # solve ahead while the plant moves
            return u
        if hasattr(c, "optimize"):
            x_c = x0 if self._ctrl_idx is None else x0[self._ctrl_idx]
            return np.atleast_1d(np.asarray(c.optimize(x_c, **kwargs)))
        if hasattr(c, "call"):
            return np.atleast_1d(np.asarray(c.call(x0)))
        if hasattr(c, "predict"):
            # trained ANN/GP policy (reference supports ANN controllers,
            # control_loop.py:372-377)
            out = np.asarray(c.predict(np.atleast_2d(x0)))
            return np.atleast_1d(out[0] if out.ndim > 1 else out)
        if callable(c):
            return np.atleast_1d(np.asarray(c(x0)))
        raise TypeError(f"unsupported controller {type(c).__name__}")

    def run(self, steps: int, p=None, live_plot=False, live_plot_kwargs=None,
            rti: bool = False, **kwargs):
        """Run the closed loop. Extra kwargs (e.g. ref_sc / ref_tc setpoint
        dicts) are forwarded to the controller's optimize call each step, like
        the reference (control_loop.py:366,399).

        ``live_plot=True`` animates the loop after every step on the active
        plot backend — matplotlib (in-place figure updates) or bokeh
        (ColumnDataSource streaming into a saved auto-refreshing HTML
        document, or a bokeh server app with ``live_plot_kwargs=
        {'mode': 'server'}``). The strings ``'matplotlib'`` / ``'bokeh'``
        select a backend explicitly. Reference: live bokeh-server / mpl
        animation, control_loop.py:202-285; with the 'bokeh' backend selected
        but bokeh not installed this raises the plugin gate's ImportError."""
        plant = self._plant
        if plant.solution is None or plant.solution.n_samples == 0:
            raise RuntimeError("set plant initial conditions first "
                               "(plant.set_initial_conditions(x0))")
        if rti and not hasattr(self._controller, "rti_feedback"):
            raise TypeError("rti=True needs a controller with an RTI mode "
                            f"(NMPC); got {type(self._controller).__name__}")
        self._rti = rti
        plotter = _make_live_plotter(self.solution, live_plot,
                                     **(live_plot_kwargs or {}))
        x0 = plant.solution["x:f"]
        for k in range(steps):
            u = self._control(x0, k, last=(k == steps - 1), **kwargs)
            out = plant.simulate(u=u, p=p, steps=1)
            x_true = out["x"][-1]
            y = out["y"][-1]
            if self._observer is not None:
                est = self._observer.estimate(y=y, u=u)
                x0 = x_true if est is None else np.atleast_1d(np.asarray(est))
                if isinstance(est, tuple):
                    x0 = np.atleast_1d(np.asarray(est[0]))
            else:
                x0 = x_true
            self.solution.append(plant.solution["t"][-1], x=x_true, u=u, y=y)
            if plotter is not None:
                plotter.update()
        if plotter is not None:
            plotter.finish()
        return self.solution

    def plot(self, **kwargs):
        from .utils.plotting import plot_series

        return plot_series(self.solution, **kwargs)
