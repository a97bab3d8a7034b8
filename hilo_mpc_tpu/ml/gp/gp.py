"""Gaussian process regression with exact inference and hyperparameter fitting.

TPU-native rebuild of the reference's GaussianProcess/GPArray (reference: hilo_mpc/
modules/machine_learning/gp/gp.py:80-1008). The reference builds the posterior as
CasADi SX and fits with IPOPT or a SciPy fallback (gp.py:609-634); here the negative
log marginal likelihood is a pure JAX function over unconstrained (log-space)
hyperparameters, fitted by L-BFGS-B (scipy, gradients from jax) or Adam (optax) —
and `predict_fn()` returns a traceable function so a fitted GP embeds directly into
MPC stage costs, SMPC surrogates, and hybrid models (no symbolic substitution layer
needed).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..hyperparameters import Hyperparameter
from .inference import ExactInference, ExpectationPropagation, Laplace
from .kernels import Kernel, SquaredExponentialKernel
from .likelihood import Gaussian, Likelihood, Logistic, Probit, StudentsT
from .means import Mean, ZeroMean


class GaussianProcess:
    def __init__(self, features: Union[str, List[str]],
                 labels: Union[str, List[str]],
                 kernel: Optional[Kernel] = None,
                 mean: Optional[Mean] = None,
                 noise_variance: float = 1.0,
                 inference: str = "exact",
                 likelihood: str = "gaussian",
                 solver: str = "scipy",
                 id: Optional[str] = None, name: Optional[str] = None):
        self.features = [features] if isinstance(features, str) else list(features)
        labels = [labels] if isinstance(labels, str) else list(labels)
        if len(labels) != 1:
            raise ValueError("one GP handles one output; use GPArray for "
                             "multi-output regression")
        self.labels = labels
        self.kernel = kernel if kernel is not None else SquaredExponentialKernel(
            length_scales=np.ones(len(self.features)))
        self.mean = mean if mean is not None else ZeroMean()
        # exact inference for the Gaussian likelihood; the Laplace
        # approximation for logistic/probit classification and Student's-t
        # robust regression; expectation propagation for probit
        # classification — all surfaces the reference only declares
        # (gp/inference.py:224-257, gp/likelihood.py:78-102).
        # Still-unimplemented names raise NotImplementedError, unknown names
        # ValueError — the reference factories' contract.
        inf_key = inference.lower().replace(" ", "_").replace("-", "_")
        if inf_key in ("variational_bayes", "vb", "kullback_leibler", "kl"):
            raise NotImplementedError(
                f"inference {inference!r} is declared but not implemented "
                f"(the reference declares the same stubs); use 'exact', "
                f"'laplace', or 'ep'")
        if inf_key not in ("exact", "exactinference", "laplace",
                           "expectation_propagation", "ep"):
            raise ValueError(f"Inference {inference!r} not recognized")
        if isinstance(likelihood, Likelihood):
            self.likelihood = likelihood
        else:
            lik_key = likelihood.lower().replace(" ", "_").replace(
                "-", "_").replace("'", "")
            if lik_key in ("gaussian", "normal"):
                self.likelihood = Gaussian()
            elif lik_key == "logistic":
                self.likelihood = Logistic()
            elif lik_key == "probit":
                self.likelihood = Probit()
            elif lik_key in ("students_t", "studentst", "student_t"):
                self.likelihood = StudentsT()
            elif lik_key == "laplacian":
                from .likelihood import Laplacian
                Laplacian()  # raises NotImplementedError with the reason
            else:
                raise ValueError(f"Likelihood {likelihood!r} not recognized")
        if inf_key in ("expectation_propagation", "ep"):
            if self.likelihood.name != "probit":
                raise ValueError(
                    "expectation propagation requires the probit likelihood "
                    "(its moment integrals are closed-form only there, GPML "
                    f"section 3.6); got {self.likelihood.name!r} — use "
                    "inference='laplace' instead")
            self.inference = "ep"
        elif inf_key == "laplace":
            self.inference = "laplace"
        else:
            if self.likelihood.name != "gaussian":
                raise ValueError(
                    f"exact inference requires the Gaussian likelihood (the "
                    f"reference enforces the same, gp/inference.py:194); use "
                    f"inference='laplace' for {self.likelihood.name!r}")
            self.inference = "exact"
        self.noise_variance = Hyperparameter("GP.noise_variance",
                                             value=noise_variance, positive=True)
        if not self.likelihood.uses_noise:
            # logistic classification has no observation-noise parameter:
            # exclude it from fitting so the optimizer cannot wander it
            self.noise_variance.fixed = True
        self.solver = solver
        self.name = name or "gp"
        self.X_train: Optional[np.ndarray] = None   # (n, d)
        self.y_train: Optional[np.ndarray] = None   # (n,)
        self._state = None   # (L, alpha) posterior cache
        self._setup_done = False

    # -- data ----------------------------------------------------------------
    def set_training_data(self, X, y):
        if self._setup_done:
            import warnings
            warnings.warn(
                "Gaussian process was already executed. Use the fit_model() "
                "method again to optimize with respect to the newly set "
                "training data.")
        X = np.asarray(X, dtype=float)
        y = np.asarray(y, dtype=float)
        d = len(self.features)
        if X.ndim == 1:
            X = X[:, None] if d == 1 else X[None, :]
        # accept the reference's (d, n) column layout as well as (n, d)
        if X.shape[1] != d and X.shape[0] == d:
            X = X.T
        if X.shape[1] != d:
            raise ValueError(f"X has {X.shape[1]} features, expected {d}")
        y = y.ravel()
        if y.size != X.shape[0]:
            raise ValueError(f"{X.shape[0]} samples but {y.size} labels")
        if self.likelihood.name in ("logistic", "probit"):
            # classification labels: accept {0, 1} or {-1, +1}, store {-1, +1}
            vals = set(np.unique(y).tolist())
            if vals <= {0.0, 1.0}:
                y = 2.0 * y - 1.0
            elif not vals <= {-1.0, 1.0}:
                raise ValueError(
                    f"{self.likelihood.name} likelihood needs binary labels "
                    f"in {{0,1}} or {{-1,+1}}, got values {sorted(vals)[:5]}")
        self.X_train, self.y_train = X, y
        self._state = None
        return self

    @property
    def n_samples(self):
        return 0 if self.X_train is None else self.X_train.shape[0]

    # -- hyperparameters ------------------------------------------------------
    @property
    def hyperparameters(self) -> List[Hyperparameter]:
        return (self.kernel.hyperparameters + self.mean.hyperparameters
                + [self.noise_variance])

    def _params(self) -> Dict[str, jnp.ndarray]:
        return {hp.key: (jnp.squeeze(jnp.asarray(hp.value)) if hp.size == 1
                          else jnp.asarray(hp.value))
                for hp in self.hyperparameters}

    def _pack(self):
        """Trainable hyperparameters -> flat unconstrained vector + bounds."""
        w0, specs, bounds = [], [], []
        for hp in self.hyperparameters:
            if hp.fixed:
                continue
            w = hp.to_unconstrained().ravel()
            specs.append((hp, len(w)))
            w0.append(w)
            if hp.bounds is not None:
                lb, ub = hp.bounds
                lb = np.log(lb) if hp.positive else lb
                ub = np.log(ub) if hp.positive else ub
                bounds += [(lb, ub)] * len(w)
            elif hp.positive:
                # keep log-space parameters representable: exp(-35) underflows to
                # exactly 0.0 and would violate positivity when written back
                bounds += [(-30.0, 30.0)] * len(w)
            else:
                bounds += [(None, None)] * len(w)
        return (np.concatenate(w0) if w0 else np.zeros(0)), specs, bounds

    def _unpack(self, w, specs):
        params = self._params()
        off = 0
        for hp, n in specs:
            val = w[off:off + n]
            off += n
            val = jnp.exp(val) if hp.positive else val
            params[hp.key] = (jnp.squeeze(val) if hp.size == 1
                               else val.reshape(np.shape(hp.value)))
        return params

    # -- objective -------------------------------------------------------------
    def _nll(self, params):
        X = jnp.asarray(self.X_train)
        y = jnp.asarray(self.y_train)
        # the stored value acts as a standard deviation, like the reference
        # (inference.py:199 exp(2*log_noise))
        sn2 = jnp.squeeze(params[self.noise_variance.key]) ** 2
        if self.inference == "laplace":
            lml = Laplace.log_marginal_likelihood(
                self.kernel, self.mean, params, X, y, sn2, self.likelihood)
        elif self.inference == "ep":
            lml = ExpectationPropagation.log_marginal_likelihood(
                self.kernel, self.mean, params, X, y)
        else:
            lml = ExactInference.log_marginal_likelihood(
                self.kernel, self.mean, params, X, y, sn2)
        logp = 0.0
        for hp in self.hyperparameters:
            if hp.prior is not None:
                logp = logp + hp.log_prior(params[hp.key])
        return -(lml + logp)

    @property
    def log_marginal_likelihood(self) -> float:
        return float(-self._nll(self._params()))

    # -- setup / fit -----------------------------------------------------------
    def setup(self):
        if self.X_train is None:
            raise RuntimeError("call set_training_data(X, y) first")
        self._refresh_state()
        self._setup_done = True
        return self

    def _refresh_state(self):
        params = self._params()
        sn2 = float(np.squeeze(self.noise_variance.value)) ** 2
        if self.inference == "laplace":
            # mode finding runs once per fit, eagerly (x64 when enabled);
            # predictions stay fully traced/jittable via the stored state
            f_hat, g, sW, L, _ = Laplace.mode_state(
                self.kernel, self.mean, params, jnp.asarray(self.X_train),
                jnp.asarray(self.y_train), sn2, self.likelihood)
            self._state = ("laplace", np.asarray(g), np.asarray(sW),
                           np.asarray(L))
            return
        if self.inference == "ep":
            w, stt, L, _ = ExpectationPropagation.site_state(
                self.kernel, self.mean, params, jnp.asarray(self.X_train),
                jnp.asarray(self.y_train))
            self._state = ("ep", np.asarray(w), np.asarray(stt),
                           np.asarray(L))
            return
        # evaluate the gram with the accelerator (cheap, well-conditioned) but
        # FACTORIZE on the host in float64: with small noise the system is
        # condition ~1/(sn2+jitter) and f32 (worse: TPU bf16) factorizations
        # give backend-dependent garbage for L/alpha. This runs once per fit,
        # eagerly — predictions stay fully traced/jittable via the stored state.
        X = jnp.asarray(self.X_train)
        K = np.asarray(self.kernel.gram(params, X), dtype=np.float64)
        n = K.shape[0]
        m = np.asarray(
            jax.vmap(lambda a: self.mean.eval(params, a))(X), dtype=np.float64)
        resid = np.asarray(self.y_train, dtype=np.float64) - m
        for jitter in (1e-10, 1e-8, 1e-6, 1e-4, 1e-2):
            try:
                Kj = K + (sn2 + jitter * float(np.mean(np.diagonal(K)))) * np.eye(n)
                L = np.linalg.cholesky(Kj)
                break
            except np.linalg.LinAlgError:
                continue
        else:
            raise RuntimeError("GP gram matrix is not factorizable")
        import scipy.linalg as _sla
        alpha = _sla.cho_solve((L, True), resid)
        self._state = (L, alpha)

    def is_setup(self):
        return self._setup_done

    def fit_model(self, solver: Optional[str] = None, max_iter: int = 200,
                  learning_rate: float = 5e-2):
        """Maximize the (prior-weighted) log marginal likelihood."""
        if self.X_train is None:
            raise RuntimeError("call set_training_data(X, y) first")
        solver = solver or self.solver
        w0, specs, bounds = self._pack()
        if w0.size == 0:
            self._refresh_state()
            return self

        obj = jax.jit(lambda w: self._nll(self._unpack(w, specs)))
        grad = jax.jit(jax.grad(lambda w: self._nll(self._unpack(w, specs))))

        if solver in ("scipy", "lbfgs", "ipopt"):
            # 'ipopt' maps to L-BFGS-B: same quasi-Newton accuracy class, and the
            # reference itself falls back to SciPy (util/optimizer.py:145)
            from scipy.optimize import minimize

            # NaN-guard: a trial step can push hyperparameters where the
            # Cholesky fails; report a huge objective (and zero gradient)
            # there so the line search backtracks instead of aborting
            def f_np(w):
                v = float(np.asarray(obj(jnp.asarray(w))))
                return v if np.isfinite(v) else 1e12

            def g_np(w):
                g = np.asarray(grad(jnp.asarray(w)), dtype=float)
                return np.nan_to_num(g, nan=0.0, posinf=1e6, neginf=-1e6)

            res = minimize(f_np, w0, jac=g_np, method="L-BFGS-B",
                           bounds=bounds, options={"maxiter": max_iter})
            w_best = res.x
        elif solver == "adam":
            # whole optimization as ONE device dispatch (lax.scan over steps) —
            # a Python-loop fit pays a host round-trip per step, which is ruinous
            # over remote-TPU tunnels
            import optax

            tx = optax.adam(learning_rate)

            def fit(w0_):
                state0 = tx.init(w0_)

                def step(carry, _):
                    w, state = carry
                    g = jax.grad(lambda ww: self._nll(self._unpack(ww, specs)))(w)
                    updates, state = tx.update(g, state)
                    return (optax.apply_updates(w, updates), state), None

                (w, _), _ = jax.lax.scan(step, (w0_, state0), None,
                                         length=max_iter)
                return w

            w_best = np.asarray(jax.jit(fit)(jnp.asarray(w0)))
        else:
            raise ValueError(f"unknown solver {solver!r} (scipy | adam)")

        params = self._unpack(jnp.asarray(w_best), specs)
        for hp, _ in specs:
            hp.value = np.asarray(params[hp.key])
        self._refresh_state()
        self._setup_done = True
        return self

    # -- prediction -------------------------------------------------------------
    def predict_fn(self, include_noise: bool = False):
        """Pure (mu, var) = f(x) for a single query point — traceable, so it can be
        called inside jitted MPC graphs (the analogue of the reference's symbolic
        predict, gp.py:699-718)."""
        if self._state is None:
            self._refresh_state()
        params = self._params()
        X = jnp.asarray(self.X_train)
        sn2 = float(np.squeeze(self.noise_variance.value)) ** 2
        kernel, mean = self.kernel, self.mean
        if isinstance(self._state[0], str) and self._state[0] == "laplace":
            _, g, sW, L = self._state

            def fn(x_star):
                x_star = jnp.atleast_1d(x_star)
                mu, var = Laplace.predict(
                    kernel, mean, params, X, jnp.asarray(g), jnp.asarray(sW),
                    jnp.asarray(L), x_star)
                if include_noise and self.likelihood.uses_noise:
                    var = var + sn2
                return mu, var

            return fn
        if isinstance(self._state[0], str) and self._state[0] == "ep":
            _, w, stt, L = self._state

            def fn(x_star):
                x_star = jnp.atleast_1d(x_star)
                return ExpectationPropagation.predict(
                    kernel, mean, params, X, jnp.asarray(w), jnp.asarray(stt),
                    jnp.asarray(L), x_star)

            return fn
        L, alpha = self._state

        def fn(x_star):
            x_star = jnp.atleast_1d(x_star)
            return ExactInference.predict(
                kernel, mean, params, X, jnp.asarray(L), jnp.asarray(alpha),
                x_star, sn2, include_noise=include_noise)

        return fn

    def predict(self, X_query, include_noise: bool = False):
        """Numeric batch prediction: returns (means, variances)."""
        fn = self.predict_fn(include_noise=include_noise)
        Xq = np.asarray(X_query, dtype=float)
        d = len(self.features)
        if Xq.ndim == 1:
            Xq = Xq[:, None] if d == 1 else Xq[None, :]
        if Xq.shape[1] != d and Xq.shape[0] == d:
            Xq = Xq.T
        mu, var = jax.vmap(fn)(jnp.asarray(Xq))
        return np.asarray(mu), np.asarray(var)

    def predict_proba(self, X_query):
        """p(y = +1 | x) for classification GPs. Probit likelihood: the
        predictive integral is EXACT, pi* = Phi(mu / sqrt(1 + sigma_f^2))
        (GPML eq. 3.80). Logistic likelihood: the probit approximation
        pi* ~= sigma(mu / sqrt(1 + pi sigma_f^2 / 8))."""
        if self.likelihood.name not in ("logistic", "probit"):
            raise RuntimeError(
                "predict_proba requires a classification likelihood "
                f"(logistic or probit; this GP uses {self.likelihood.name!r})")
        mu, var = self.predict(X_query)
        if self.likelihood.name == "probit":
            from scipy.stats import norm

            return norm.cdf(mu / np.sqrt(1.0 + var))
        from scipy.special import expit

        return expit(mu / np.sqrt(1.0 + np.pi * var / 8.0))

    def predict_quantiles(self, X_query, quantiles=(0.025, 0.975)):
        from scipy.stats import norm

        mu, var = self.predict(X_query, include_noise=True)
        std = np.sqrt(var)
        return [mu + norm.ppf(q) * std for q in quantiles]

    def __repr__(self):
        return (f"GaussianProcess(features={self.features}, labels={self.labels}, "
                f"kernel={self.kernel!r}, n={self.n_samples})")


class GPArray:
    """Array of independent single-output GPs (reference: gp.py:974-1008)."""

    def __init__(self, n_gps: int):
        if n_gps < 1:
            raise ValueError("n_gps must be >= 1")
        self._gps: List[Optional[GaussianProcess]] = [None] * int(n_gps)

    def __len__(self):
        return len(self._gps)

    def __getitem__(self, i):
        return self._gps[i]

    def __setitem__(self, i, gp):
        if not isinstance(gp, GaussianProcess):
            raise TypeError("GPArray elements must be GaussianProcess instances")
        self._gps[i] = gp

    def __iter__(self):
        return iter(self._gps)

    def setup(self):
        for gp in self._gps:
            gp.setup()
        return self

    def fit_model(self, **kwargs):
        for gp in self._gps:
            gp.fit_model(**kwargs)
        return self

    def fit_model_batched(self, max_iter: int = 200, learning_rate: float = 5e-2,
                          solver: str = "lbfgs"):
        """Fit ALL output GPs in ONE jitted, vmapped on-device optimization.

        The reference fits each output's hyperparameters with a separate
        host-side IPOPT/SciPy run (reference: gp/gp.py:609-641, GPArray loops
        gp.py:974-1008); here the whole array trains as a single device
        dispatch — `vmap` over outputs of an L-BFGS (optax.lbfgs, with its
        zoom linesearch) or Adam scan on the negative log marginal
        likelihood. This is the SMPC/hybrid workflow path: one jit trains 8+
        output GPs (or scenario-stacked datasets) without a host round-trip
        per iteration.

        Requires all GPs to share the hyperparameter structure (same kernel/
        mean families — the values stay per-GP) and training-set shape.
        """
        import jax
        import jax.numpy as jnp
        import optax

        from .inference import ExactInference

        gps = [gp for gp in self._gps]
        if any(gp is None for gp in gps):
            raise RuntimeError("assign every GPArray slot before fitting")
        if any(gp.X_train is None for gp in gps):
            raise RuntimeError("call set_training_data on every GP first")
        if any(gp.inference != "exact" for gp in gps):
            raise ValueError("fit_model_batched supports exact inference "
                             "only; use fit_model() per GP for Laplace")
        gp0 = gps[0]
        packs = [gp._pack() for gp in gps]
        w0s, specs0, bounds0 = packs[0]
        sig0 = [(hp.name, n) for hp, n in specs0]
        fixed0 = [hp for hp in gp0.hyperparameters if hp.fixed]
        fsig0 = [(hp.name, hp.size) for hp in fixed0]
        for gp, (w, specs, _) in zip(gps, packs):
            if [(hp.name, n) for hp, n in specs] != sig0:
                raise ValueError(
                    "fit_model_batched needs identical hyperparameter "
                    "structure across the array (same kernel/mean families)")
            fixed_i = [hp for hp in gp.hyperparameters if hp.fixed]
            if [(hp.name, hp.size) for hp in fixed_i] != fsig0:
                raise ValueError(
                    "fit_model_batched needs the same FIXED hyperparameter "
                    "structure across the array")
            # priors enter the objective as host-side python closures of gp0's
            # hyperparameters — they cannot vary per output inside one jit
            for hp_a, hp_b in zip(gp0.hyperparameters, gp.hyperparameters):
                pa, pb = hp_a.prior, hp_b.prior
                same = (pa is None) == (pb is None) and (
                    pa is None or (type(pa) is type(pb)
                                   and vars(pa) == vars(pb)))
                if not same:
                    raise ValueError(
                        f"fit_model_batched needs identical priors across "
                        f"the array ({hp_a.name} differs); use fit_model() "
                        f"per GP for heterogeneous priors")
            if gp.X_train.shape != gp0.X_train.shape:
                raise ValueError("fit_model_batched needs equal training-set "
                                 "shapes across the array")
        if w0s.size == 0:
            for gp in gps:
                gp._refresh_state()
                gp._setup_done = True
            return self

        W0 = jnp.asarray(np.stack([w for w, _, _ in packs]))
        Xs = jnp.asarray(np.stack([np.asarray(gp.X_train) for gp in gps]))
        ys = jnp.asarray(np.stack([np.asarray(gp.y_train) for gp in gps]))
        noise_name = gp0.noise_variance.key
        prior_hps = [hp for hp in gp0.hyperparameters if hp.prior is not None]
        # per-GP FIXED values, stacked over the array and routed through the
        # vmap so every output is fitted against its OWN fixed parameters
        # (not gp0's)
        fixed_stacks = tuple(
            jnp.asarray(np.stack([
                np.atleast_1d(np.asarray(
                    [h for h in gp.hyperparameters if h.fixed][j].value))
                for gp in gps]))
            for j in range(len(fixed0)))
        # per-GP bounds in the unconstrained space (finding: the host
        # fit_model enforces these via L-BFGS-B; enforce them here by
        # projection after every update)
        lb_ub = []
        for gp, (_, _, bnds) in zip(gps, packs):
            lb = np.array([-np.inf if b[0] is None else b[0] for b in bnds])
            ub = np.array([np.inf if b[1] is None else b[1] for b in bnds])
            lb_ub.append((lb, ub))
        LB = jnp.asarray(np.stack([l for l, _ in lb_ub]))
        UB = jnp.asarray(np.stack([u for _, u in lb_ub]))

        def nll(w, X, y, fixed_vals):
            params = gp0._unpack(w, specs0)
            for hp, val in zip(fixed0, fixed_vals):
                params[hp.key] = (jnp.squeeze(val) if hp.size == 1
                                  else val.reshape(np.shape(hp.value)))
            sn2 = jnp.squeeze(params[noise_name]) ** 2
            lml = ExactInference.log_marginal_likelihood(
                gp0.kernel, gp0.mean, params, X, y, sn2)
            logp = 0.0
            for hp in prior_hps:
                logp = logp + hp.log_prior(params[hp.key])
            v = -(lml + logp)
            # NaN guard: a failed Cholesky during a trial step must read as a
            # huge value so the linesearch backtracks instead of poisoning w
            return jnp.where(jnp.isfinite(v), v, 1e12)

        if solver == "lbfgs":
            opt = optax.lbfgs(learning_rate=None)

            def fit_one(w0, X, y, fixed_vals, lb, ub):
                fun = lambda w: nll(w, X, y, fixed_vals)
                vag = optax.value_and_grad_from_state(fun)

                def step(carry, _):
                    w, state = carry
                    value, grad = vag(w, state=state)
                    updates, state = opt.update(
                        grad, state, w, value=value, grad=grad, value_fn=fun)
                    w = jnp.clip(optax.apply_updates(w, updates), lb, ub)
                    return (w, state), value

                (w, _), vals = jax.lax.scan(step, (w0, opt.init(w0)), None,
                                            length=max_iter)
                return w, vals[-1]
        elif solver == "adam":
            opt = optax.adam(learning_rate)

            def fit_one(w0, X, y, fixed_vals, lb, ub):
                fun = lambda w: nll(w, X, y, fixed_vals)

                def step(carry, _):
                    w, state = carry
                    value, grad = jax.value_and_grad(fun)(w)
                    updates, state = opt.update(grad, state)
                    w = jnp.clip(optax.apply_updates(w, updates), lb, ub)
                    return (w, state), value

                (w, _), vals = jax.lax.scan(step, (w0, opt.init(w0)), None,
                                            length=max_iter)
                return w, vals[-1]
        else:
            raise ValueError(f"unknown solver {solver!r} (lbfgs | adam)")

        W, finals = jax.jit(jax.vmap(fit_one))(W0, Xs, ys, fixed_stacks,
                                               LB, UB)
        W = np.asarray(W)
        for i, (gp, (_, specs, _)) in enumerate(zip(gps, packs)):
            params = gp._unpack(jnp.asarray(W[i]), specs)
            for hp, _n in specs:
                hp.value = np.asarray(params[hp.key])
            gp._refresh_state()
            gp._setup_done = True
        self.last_fit_nll = np.asarray(finals)
        return self

    def predict(self, X_query, **kwargs):
        out = [gp.predict(X_query, **kwargs) for gp in self._gps]
        means = np.stack([m for m, _ in out], axis=-1)
        variances = np.stack([v for _, v in out], axis=-1)
        return means, variances
