"""GP inference methods (reference: hilo_mpc/modules/machine_learning/gp/
inference.py:44-257 — exact inference implemented, approximate methods declared).

Exact posterior (Rasmussen & Williams alg. 2.1) as pure JAX: Cholesky of
K + sigma_n^2 I, alpha-solve, posterior mean/variance and log marginal likelihood.
Everything is traceable, so a fitted GP embeds straight into MPC/model graphs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Inference:
    pass


class ExactInference(Inference):
    @staticmethod
    def posterior_state(kernel, mean, params, X, y, noise_variance, jitter=None):
        """Precompute (L, alpha) for training data X (n, d), y (n,).

        A dtype-aware jitter floor (relative to the gram diagonal) keeps the
        Cholesky factorizable when noise_variance is below the float's
        resolution — e.g. sigma_n=1e-4 means variance 1e-8, invisible next to
        O(1) gram entries in f32. Without it the posterior is silently NaN.
        """
        n = X.shape[0]
        with jax.default_matmul_precision("highest"):
            K = kernel.gram(params, X)
        if jitter is None:
            jitter = 1e-6 if K.dtype == jnp.float32 else 1e-12
        floor = jitter * jnp.mean(jnp.diagonal(K))
        K = K + (noise_variance + floor) * jnp.eye(n, dtype=K.dtype)
        with jax.default_matmul_precision("highest"):
            # TPU-default bf16 matmuls corrupt the factorization enough to
            # flip posterior variances negative — GP numerics always run full
            L = jnp.linalg.cholesky(K)
            m = jax.vmap(lambda a: mean.eval(params, a))(X)
            resid = y - m
            alpha = jax.scipy.linalg.cho_solve((L, True), resid)
        return L, alpha, resid

    @staticmethod
    def log_marginal_likelihood(kernel, mean, params, X, y, noise_variance):
        n = X.shape[0]
        L, alpha, resid = ExactInference.posterior_state(
            kernel, mean, params, X, y, noise_variance)
        return (-0.5 * jnp.dot(resid, alpha)
                - jnp.sum(jnp.log(jnp.diagonal(L)))
                - 0.5 * n * jnp.log(2 * jnp.pi))

    @staticmethod
    def predict(kernel, mean, params, X, L, alpha, x_star, noise_variance,
                include_noise=False):
        """Posterior mean and variance at a single query point x_star (d,)."""
        with jax.default_matmul_precision("highest"):
            k_star = jax.vmap(lambda a: kernel.eval(params, a, x_star))(X)
            mu = mean.eval(params, x_star) + jnp.dot(k_star, alpha)
            v = jax.scipy.linalg.solve_triangular(L, k_star, lower=True)
            k_ss = kernel.eval(params, x_star, x_star)
            var = k_ss - jnp.dot(v, v)
        # relative floor: below the float's resolution of k(x,x) a posterior
        # variance is numerically indistinguishable from zero anyway
        eps = 1e-6 if var.dtype == jnp.float32 else 1e-12
        var = jnp.maximum(var, eps * k_ss)
        if include_noise:
            var = var + noise_variance
        return mu, var


class Laplace(Inference):
    """Laplace approximation for non-Gaussian likelihoods (GPML algorithms
    3.1/3.2). The reference DECLARES this inference but leaves it a stub
    (reference: hilo_mpc/modules/machine_learning/gp/inference.py:224-230);
    here it is implemented as pure JAX: the posterior mode is found by a
    fixed-trip Newton iteration in the numerically stable
    ``B = I + W^{1/2} K W^{1/2}`` parameterization, everything jits, and the
    log marginal likelihood is differentiable THROUGH the mode finding, so
    hyperparameter fitting uses the same L-BFGS/Adam paths as exact
    inference. Works with any likelihood exposing ``log_pdf(f, y, sn2)``
    (ml/gp/likelihood.py); for the Gaussian likelihood the posterior is
    exactly Gaussian, Newton converges in one step, and results coincide
    with exact inference (pinned by tests/test_gp_laplace.py).
    """

    #: curvature floor for non-log-concave likelihoods (Student's t): W_ii
    #: below this is clipped so B stays positive definite
    W_FLOOR = 1e-8
    NEWTON_ITERS = 25

    @staticmethod
    def _gram(kernel, params, X, dtype_hint=None):
        with jax.default_matmul_precision("highest"):
            K = kernel.gram(params, X)
        jitter = 1e-6 if K.dtype == jnp.float32 else 1e-10
        n = X.shape[0]
        return K + jitter * jnp.mean(jnp.diagonal(K)) * jnp.eye(n, dtype=K.dtype)

    @staticmethod
    def mode_state(kernel, mean, params, X, y, sn2, likelihood,
                   iters: int = None):
        """Find the posterior mode f_hat (GPML alg. 3.1) and return
        ``(f_hat, g, sW, L, lml)`` where g = grad log p(y|f_hat), sW = W^{1/2}
        at the mode, L = chol(I + sW K sW), lml the Laplace log marginal
        likelihood. All traceable; fixed iteration count (Newton converges
        quadratically — 25 trips is far past convergence for log-concave
        likelihoods at f64)."""
        iters = Laplace.NEWTON_ITERS if iters is None else iters
        n = X.shape[0]
        K = Laplace._gram(kernel, params, X)
        m = jax.vmap(lambda a: mean.eval(params, a))(X)
        y = jnp.asarray(y, K.dtype)

        lp_sum = lambda f: jnp.sum(likelihood.log_pdf(f, y, sn2))
        grad_lp = jax.grad(lp_sum)

        def curvature(f):
            # W = -d^2/df^2 log p(y|f), elementwise (diagonal)
            d2 = jax.grad(lambda ff: jnp.sum(grad_lp(ff)))(f)
            W = -d2
            return jnp.maximum(W, Laplace.W_FLOOR)

        eye = jnp.eye(n, dtype=K.dtype)
        # objective of the mode search: psi(f) = log p(y|f) - 0.5 (f-m)' K^-1 (f-m);
        # with a = K^-1 (f-m) carried alongside f the quadratic term is a
        # cheap dot product and candidates along the Newton direction are
        # linear interpolations (no extra gram products)
        alphas = 0.5 ** jnp.arange(8, dtype=K.dtype)

        def newton(carry, _):
            f, a = carry
            W = curvature(f)
            sW = jnp.sqrt(W)
            B = eye + sW[:, None] * K * sW[None, :]
            with jax.default_matmul_precision("highest"):
                L = jnp.linalg.cholesky(B)
                b = W * (f - m) + grad_lp(f)
                t = jax.scipy.linalg.cho_solve((L, True), sW * (K @ b))
                a_full = b - sW * t
                f_full = K @ a_full + m

            # backtracking line search on psi: plain Newton oscillates for
            # non-log-concave likelihoods (Student's t); log-concave cases
            # accept alpha=1 and this reduces to the pure Newton step
            def psi(al):
                a_c = (1.0 - al) * a + al * a_full
                f_c = (1.0 - al) * f + al * f_full
                v = lp_sum(f_c) - 0.5 * jnp.dot(a_c, f_c - m)
                return jnp.where(jnp.isfinite(v), v, -jnp.inf)

            vals = jax.vmap(psi)(alphas)
            best = jnp.argmax(vals)
            al = alphas[best]
            f_new = (1.0 - al) * f + al * f_full
            a_new = (1.0 - al) * a + al * a_full
            # NaN guard: a failed factorization keeps the previous iterate
            ok = jnp.all(jnp.isfinite(f_new)) & (vals[best] > -jnp.inf)
            return (jnp.where(ok, f_new, f), jnp.where(ok, a_new, a)), None

        (f_hat, _), _ = jax.lax.scan(newton, (m, jnp.zeros(n, K.dtype)), None,
                                     length=iters)

        W = curvature(f_hat)
        sW = jnp.sqrt(W)
        B = eye + sW[:, None] * K * sW[None, :]
        with jax.default_matmul_precision("highest"):
            L = jnp.linalg.cholesky(B)
            g = grad_lp(f_hat)
            # a = K^{-1}(f_hat - m) without forming K^{-1}: at the mode
            # a = g (stationarity), but use the stabilized recomputation so
            # the lml stays exact for finite iteration counts
            b = W * (f_hat - m) + g
            t = jax.scipy.linalg.cho_solve((L, True), sW * (K @ b))
            a = b - sW * t
        lml = (-0.5 * jnp.dot(a, f_hat - m) + jnp.sum(
            likelihood.log_pdf(f_hat, y, sn2))
            - jnp.sum(jnp.log(jnp.diagonal(L))))
        return f_hat, g, sW, L, lml

    @staticmethod
    def log_marginal_likelihood(kernel, mean, params, X, y, sn2, likelihood):
        return Laplace.mode_state(kernel, mean, params, X, y, sn2,
                                  likelihood)[4]

    @staticmethod
    def predict(kernel, mean, params, X, g, sW, L, x_star):
        """Latent posterior (mu, var) at a single query point (GPML alg. 3.2)."""
        with jax.default_matmul_precision("highest"):
            k_star = jax.vmap(lambda a: kernel.eval(params, a, x_star))(X)
            mu = mean.eval(params, x_star) + jnp.dot(k_star, g)
            v = jax.scipy.linalg.solve_triangular(L, sW * k_star, lower=True)
            k_ss = kernel.eval(params, x_star, x_star)
            var = k_ss - jnp.dot(v, v)
        eps = 1e-6 if var.dtype == jnp.float32 else 1e-12
        return mu, jnp.maximum(var, eps * k_ss)


class ExpectationPropagation(Inference):
    """Expectation propagation for probit-likelihood classification (GPML
    algorithms 3.5/3.6). The reference declares this inference but leaves it
    a stub (reference: hilo_mpc/modules/machine_learning/gp/inference.py:
    233-239); here it is implemented in the jit-friendly PARALLEL-EP form:
    each sweep computes every site's cavity from the current posterior,
    moment-matches all sites at once (closed form for probit — the reason
    EP requires that likelihood), applies a damped site update, and
    recomputes the posterior through the stable ``B = I + S^{1/2} K
    S^{1/2}`` factorization. The EP log marginal likelihood is assembled
    from first principles as

        log Z_EP = sum_i [ log Phi(z_i) - log N(mu_cav_i | mu_site_i,
                           s2_cav_i + 1/tau_site_i) ]
                   + log N(mu_site | m, K + S^{-1})

    (site zeroth-moment matching x the Gaussian convolution integral) and is
    pinned against a brute-force 2-D quadrature oracle in
    tests/test_gp_ep.py. Differentiable through the sweeps, so the standard
    L-BFGS/Adam fit paths apply unchanged.
    """

    SWEEPS = 40
    DAMPING = 0.7
    TAU_FLOOR = 1e-10

    @staticmethod
    def site_state(kernel, mean, params, X, y, sweeps: int = None,
                   damping: float = None):
        """Run parallel EP to convergence; returns
        ``(w, sqrt_tau, L, lml)`` where w = K^{-1}(mu_post - m) drives the
        predictive mean, sqrt_tau/L the predictive variance (GPML alg. 3.6),
        and lml the EP log marginal likelihood."""
        sweeps = ExpectationPropagation.SWEEPS if sweeps is None else sweeps
        damping = (ExpectationPropagation.DAMPING if damping is None
                   else damping)
        n = X.shape[0]
        K = Laplace._gram(kernel, params, X)
        m = jax.vmap(lambda a: mean.eval(params, a))(X)
        y = jnp.asarray(y, K.dtype)
        eye = jnp.eye(n, dtype=K.dtype)
        floor = ExpectationPropagation.TAU_FLOOR

        def posterior(tt, tn):
            """(Sigma, mu, L) from site precisions tt and site ev tn."""
            stt = jnp.sqrt(tt)
            B = eye + stt[:, None] * K * stt[None, :]
            with jax.default_matmul_precision("highest"):
                L = jnp.linalg.cholesky(B)
                V = jax.scipy.linalg.solve_triangular(
                    L, stt[:, None] * K, lower=True)
                Sigma = K - V.T @ V
                mu = m + Sigma @ (tn - tt * m)
            return Sigma, mu, L

        def cavity(Sigma, mu, tt, tn):
            sig2 = jnp.diagonal(Sigma)
            tau_c = jnp.maximum(1.0 / sig2 - tt, floor)
            nu_c = mu / sig2 - tn
            return tau_c, nu_c

        def probit_moments(tau_c, nu_c):
            mu_c = nu_c / tau_c
            s2_c = 1.0 / tau_c
            denom = jnp.sqrt(1.0 + s2_c)
            z = y * mu_c / denom
            # N(z)/Phi(z), stable in the deep tail via log-space
            ratio = jnp.exp(jax.scipy.stats.norm.logpdf(z)
                            - jax.scipy.stats.norm.logcdf(z))
            mu_hat = mu_c + y * s2_c * ratio / denom
            s2_hat = s2_c - s2_c ** 2 * ratio * (z + ratio) / (1.0 + s2_c)
            s2_hat = jnp.maximum(s2_hat, floor)
            return mu_hat, s2_hat, z

        def sweep(carry, _):
            tt, tn = carry
            Sigma, mu, _ = posterior(tt, tn)
            tau_c, nu_c = cavity(Sigma, mu, tt, tn)
            mu_hat, s2_hat, _ = probit_moments(tau_c, nu_c)
            tt_new = jnp.maximum(1.0 / s2_hat - tau_c, floor)
            tn_new = mu_hat / s2_hat - nu_c
            tt_d = (1.0 - damping) * tt + damping * tt_new
            tn_d = (1.0 - damping) * tn + damping * tn_new
            ok = jnp.all(jnp.isfinite(tt_d)) & jnp.all(jnp.isfinite(tn_d))
            return (jnp.where(ok, tt_d, tt), jnp.where(ok, tn_d, tn)), None

        tt0 = jnp.full(n, floor, K.dtype)
        tn0 = jnp.zeros(n, K.dtype)
        (tt, tn), _ = jax.lax.scan(sweep, (tt0, tn0), None, length=sweeps)

        Sigma, mu, L = posterior(tt, tn)
        stt = jnp.sqrt(tt)
        # w = K^{-1}(mu_post - m) without forming K^{-1}:
        # K^{-1} Sigma = I - S^{1/2} B^{-1} S^{1/2} K
        r = tn - tt * m
        with jax.default_matmul_precision("highest"):
            t1 = jax.scipy.linalg.cho_solve((L, True), stt * (K @ r))
            w = r - stt * t1

        # -- log Z_EP from the converged cavities -----------------------------
        tau_c, nu_c = cavity(Sigma, mu, tt, tn)
        _, _, z = probit_moments(tau_c, nu_c)
        mu_c = nu_c / tau_c
        mu_site = tn / tt
        s_tot = 1.0 / tau_c + 1.0 / tt
        log_phis = jax.scipy.stats.norm.logcdf(z)
        # - log N(mu_c | mu_site, s_tot), elementwise
        site_norm = 0.5 * (jnp.log(2 * jnp.pi * s_tot)
                           + (mu_c - mu_site) ** 2 / s_tot)
        # log N(mu_site | m, K + S^{-1}) through the B factorization:
        # log|K + S^{-1}| = 2 sum log L_ii - sum log tau_site
        rs = mu_site - m
        with jax.default_matmul_precision("highest"):
            u = jax.scipy.linalg.solve_triangular(L, stt * rs, lower=True)
        log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))) - jnp.sum(
            jnp.log(tt))
        log_gauss = -0.5 * (n * jnp.log(2 * jnp.pi) + log_det
                            + jnp.dot(u, u))
        lml = jnp.sum(log_phis + site_norm) + log_gauss
        return w, stt, L, lml

    @staticmethod
    def log_marginal_likelihood(kernel, mean, params, X, y):
        return ExpectationPropagation.site_state(kernel, mean, params, X,
                                                 y)[3]

    @staticmethod
    def predict(kernel, mean, params, X, w, sqrt_tau, L, x_star):
        """Latent posterior (mu, var) at one query point (GPML alg. 3.6)."""
        with jax.default_matmul_precision("highest"):
            k_star = jax.vmap(lambda a: kernel.eval(params, a, x_star))(X)
            mu = mean.eval(params, x_star) + jnp.dot(k_star, w)
            v = jax.scipy.linalg.solve_triangular(
                L, sqrt_tau * k_star, lower=True)
            k_ss = kernel.eval(params, x_star, x_star)
            var = k_ss - jnp.dot(v, v)
        eps = 1e-6 if var.dtype == jnp.float32 else 1e-12
        return mu, jnp.maximum(var, eps * k_ss)


def _unsupported(name):
    class _Stub(Inference):
        def __init__(self, *a, **kw):
            raise NotImplementedError(
                f"{name} inference is not implemented (the reference declares the "
                f"same stub, gp/inference.py:44-257); use exact, laplace, or ep")

    _Stub.__name__ = name
    return _Stub


VariationalBayes = _unsupported("VariationalBayes")
KullbackLeibler = _unsupported("KullbackLeibler")
