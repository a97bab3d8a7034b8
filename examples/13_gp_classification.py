"""Approximate-inference Gaussian processes: classification and robust
regression (reference: the GP module declares Laplace/EP inference and the
logistic/probit/Student's-t likelihoods but stubs them,
hilo_mpc/modules/machine_learning/gp/inference.py:224-257 and
gp/likelihood.py:78-102 — here they are implemented, GPML alg. 3.1/3.2 and
3.5/3.6 as pure JAX).

Three vignettes:
1. Binary classification with the probit likelihood — EP posterior vs the
   Laplace approximation on the same data (EP is the sharper approximation).
2. predict_proba calibration along the input axis.
3. Outlier-robust regression: a Student's-t GP vs a Gaussian GP on data with
   a gross sensor glitch.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import numpy as np

from hilo_mpc_tpu import GP

rng = np.random.default_rng(4)

# --- 1+2: classification ----------------------------------------------------
n = 18
Xc = np.concatenate([rng.normal(-1.1, 0.35, n), rng.normal(1.1, 0.35, n)])[:, None]
yc = np.concatenate([-np.ones(n), np.ones(n)])

ep = GP(["x"], ["c"], likelihood="probit", inference="ep")
ep.set_training_data(Xc, yc)
ep.fit_model(max_iter=40)

lap = GP(["x"], ["c"], likelihood="probit", inference="laplace")
lap.set_training_data(Xc, yc)
lap.fit_model(max_iter=40)

Xq = np.linspace(-2.5, 2.5, 101)[:, None]
p_ep = ep.predict_proba(Xq)
p_lap = lap.predict_proba(Xq)
mu_ep, var_ep = ep.predict(Xq)

acc = float(((ep.predict_proba(Xc) > 0.5) == (yc > 0)).mean())
print(f"EP probit GP: training accuracy {acc * 100:.1f}%, "
      f"lml {ep.log_marginal_likelihood:.2f}")
print(f"Laplace probit GP: lml {lap.log_marginal_likelihood:.2f}")
print(f"max |p_EP - p_Laplace| over the query grid: "
      f"{float(np.max(np.abs(p_ep - p_lap))):.3f}")

# --- 3: robust regression ---------------------------------------------------
Xr = np.linspace(-2.0, 2.0, 25)[:, None]
clean = np.sin(1.5 * Xr[:, 0])
yr = clean + 0.03 * rng.standard_normal(25)
yr[12] += 4.0  # gross sensor glitch at x ~ 0

gauss = GP(["x"], ["y"], noise_variance=0.1)
gauss.set_training_data(Xr, yr)
gauss.setup()
robust = GP(["x"], ["y"], noise_variance=0.1, likelihood="Students t",
            inference="laplace")
robust.set_training_data(Xr, yr)
robust.setup()

Xg = np.linspace(-2.2, 2.2, 121)[:, None]
mu_g, var_g = gauss.predict(Xg)
mu_t, var_t = robust.predict(Xg)
err_g = float(np.max(np.abs(mu_g - np.sin(1.5 * Xg[:, 0]))))
err_t = float(np.max(np.abs(mu_t - np.sin(1.5 * Xg[:, 0]))))
print(f"max deviation from the clean curve — Gaussian: {err_g:.2f}, "
      f"Student's-t: {err_t:.2f} (outlier discounted)")

# --- gallery figures ---------------------------------------------------------
if _os.environ.get("HILO_EXAMPLES_OUT"):
    from _gallery import SERIES, MUTED, legend, new_fig, save, style

    fig, axes = new_fig(1, 2, width=4.6)
    ax = axes[0, 0]
    ax.plot(Xq[:, 0], p_ep, color=SERIES[0], lw=1.6, label="EP")
    ax.plot(Xq[:, 0], p_lap, color=SERIES[1], lw=1.4, ls="--",
            label="Laplace")
    ax.scatter(Xc[:, 0], (yc + 1) / 2, s=12, color=MUTED, alpha=0.6,
               label="labels")
    ax.axhline(0.5, color=MUTED, lw=0.7, ls=":")
    style(ax, title="P(y=+1 | x): EP vs Laplace (probit)", xlabel="x",
          ylabel="probability")
    legend(ax)

    ax = axes[0, 1]
    band = 1.96 * np.sqrt(var_ep)
    ax.fill_between(Xq[:, 0], mu_ep - band, mu_ep + band,
                    color=SERIES[0], alpha=0.15, lw=0)
    ax.plot(Xq[:, 0], mu_ep, color=SERIES[0], lw=1.6, label="latent mean")
    ax.scatter(Xc[:, 0], yc * 2.0, s=12, color=MUTED, alpha=0.6,
               label="labels (scaled)")
    style(ax, title="EP latent posterior f(x) ±2σ", xlabel="x",
          ylabel="latent f")
    legend(ax)
    save(fig, "13_classification.png")

    fig, axes = new_fig(1, 1)
    ax = axes[0, 0]
    ax.plot(Xg[:, 0], np.sin(1.5 * Xg[:, 0]), color=MUTED, lw=1.0, ls=":",
            label="true function")
    ax.plot(Xg[:, 0], mu_g, color=SERIES[1], lw=1.4,
            label="Gaussian likelihood")
    ax.plot(Xg[:, 0], mu_t, color=SERIES[2], lw=1.6,
            label="Student's-t likelihood")
    ax.scatter(Xr[:, 0], yr, s=14, color=MUTED, alpha=0.7, label="data")
    style(ax, title="Robust regression: one gross outlier", xlabel="x",
          ylabel="y")
    legend(ax)
    save(fig, "13_robust_regression.png")
