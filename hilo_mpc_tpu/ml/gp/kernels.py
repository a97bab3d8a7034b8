"""GP covariance kernels.

Fresh JAX implementations of the reference's 14-kernel family + operator algebra
(reference: hilo_mpc/modules/machine_learning/gp/kernel.py:49-1728). Formulas are the
textbook ones (Rasmussen & Williams ch. 4). Every kernel exposes:

  - `hyperparameters`: list of Hyperparameter objects (positive params live in
    log-space for unconstrained fitting),
  - `eval(params, x, y)`: scalar covariance of two points given a params dict — pure,
    traceable, differentiable,
  - `__call__(X, X_bar=None)`: gram matrix with current hyperparameter values
    (vmapped, works on numeric or traced inputs — GP surrogates embed into MPC graphs
    by just calling this inside a traced function).

Operator algebra mirrors the reference: k1 + k2, k1 * k2, k ** p, scale * k.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..hyperparameters import Hyperparameter

Array = jnp.ndarray


class Kernel:
    """Base class. Subclasses define `_eval(params, x, y)` over active dims."""

    acronym = "K"

    def __init__(self, active_dims=None):
        self.active_dims = (None if active_dims is None
                            else np.atleast_1d(np.asarray(active_dims, dtype=int)))
        self._hyperparameters: List[Hyperparameter] = []

    # -- hyperparameter plumbing -------------------------------------------
    def _add_hp(self, name: str, value, positive: bool = True, fixed: bool = False,
                bounds=None) -> Hyperparameter:
        hp = Hyperparameter(f"{self.acronym}.{name}", value=value,
                            positive=positive, fixed=fixed, bounds=bounds)
        self._hyperparameters.append(hp)
        return hp

    @property
    def hyperparameters(self) -> List[Hyperparameter]:
        return list(self._hyperparameters)

    def param_values(self) -> Dict[str, jnp.ndarray]:
        # size-1 parameters become scalars so kernel evaluations stay 0-d;
        # keyed by hp.key (unique per instance) so same-family kernels in one
        # composite cannot alias each other's parameters
        return {hp.key: (jnp.squeeze(jnp.asarray(hp.value)) if hp.size == 1
                         else jnp.asarray(hp.value))
                for hp in self.hyperparameters}

    # -- evaluation ---------------------------------------------------------
    def _select(self, x):
        if self.active_dims is None:
            return x
        return x[jnp.asarray(self.active_dims)]

    def eval(self, params: Dict[str, Array], x: Array, y: Array) -> Array:
        raise NotImplementedError

    def gram(self, params: Dict[str, Array], X: Array, X_bar: Optional[Array] = None
             ) -> Array:
        import jax

        X = jnp.atleast_2d(X)
        Xb = X if X_bar is None else jnp.atleast_2d(X_bar)
        return jax.vmap(lambda a: jax.vmap(lambda b: self.eval(params, a, b))(Xb))(X)

    def _check_dims(self, d: int):
        """Validate ARD length-scale vectors against the (active) input
        dimension — explicit errors like the reference's (kernel.py asserts
        matching input-space dimensions) instead of opaque broadcast failures."""
        d_eff = len(self.active_dims) if self.active_dims is not None else d
        if self.active_dims is not None and np.any(self.active_dims >= d):
            raise ValueError(f"active_dims {self.active_dims.tolist()} out of "
                             f"range for {d}-dimensional input")
        for hp in self._hyperparameters:
            if (hp.name.endswith("length_scales") and hp.size > 1
                    and hp.size != d_eff):
                raise ValueError(
                    f"{hp.name}: {hp.size} ARD length scales for "
                    f"{d_eff} input dimension(s)")

    def __call__(self, X, X_bar=None):
        X = jnp.asarray(X, dtype=jnp.result_type(float))
        # accept both (n, d) and the reference's (d, n) column layout for 1-D input
        if X.ndim == 1:
            X = X[:, None]
        Xb = None
        if X_bar is not None:
            Xb = jnp.asarray(X_bar, dtype=X.dtype)
            if Xb.ndim == 1:
                Xb = Xb[:, None]
            if Xb.shape[1] != X.shape[1]:
                raise ValueError(
                    f"X and X_bar do not have the same input space "
                    f"dimensions ({X.shape[1]} vs {Xb.shape[1]})")
        self._check_dims(X.shape[1])
        return self.gram(self.param_values(), X, Xb)

    def diag(self, X) -> Array:
        import jax

        X = jnp.atleast_2d(jnp.asarray(X, dtype=jnp.result_type(float)))
        self._check_dims(X.shape[1])
        params = self.param_values()
        return jax.vmap(lambda a: self.eval(params, a, a))(X)

    # -- operator algebra ---------------------------------------------------
    def __add__(self, other):
        if not isinstance(other, Kernel):
            other = _wrap_const(other)
        return Sum(self, other)

    def __radd__(self, other):
        return Sum(_wrap_const(other), self)

    def __mul__(self, other):
        if isinstance(other, Kernel):
            return Product(self, other)
        return Scale(self, other)

    def __rmul__(self, other):
        return Scale(self, other)

    def __pow__(self, power):
        return Power(self, power)

    def __repr__(self):
        hps = ", ".join(f"{h.name}={np.asarray(h.value)}" for h in
                        self.hyperparameters)
        return f"{type(self).__name__}({hps})"


def _wrap_const(c):
    c = float(c)
    if c < 0:
        raise ValueError("adding a negative constant does not give a valid "
                         "covariance function")
    k = ConstantKernel(bias=c ** 0.5)  # bias is squared in the covariance
    k.bias.fixed = True
    return k


# ---------------------------------------------------------------------------
# stationary family
# ---------------------------------------------------------------------------


class ConstantKernel(Kernel):
    """k(x, x') = bias^2 — the stored value acts as a standard deviation,
    matching the reference numerically (reference: gp/kernel.py:480
    exp(2*log_bias); its tests pin bias=2 -> cov 4, tests/test_kernels.py:87)."""

    acronym = "Const"

    def __init__(self, bias: float = 1.0, active_dims=None, bounds=None):
        super().__init__(active_dims)
        self.bias = self._add_hp("bias", bias, bounds=bounds)

    def eval(self, params, x, y):
        return params[self.bias.key] ** 2 * jnp.ones(())


class StationaryKernel(Kernel):
    """Kernels of the scaled distance r̄² = Σ ((x_i - y_i)/ℓ_i)²."""

    def __init__(self, active_dims=None, signal_variance: float = 1.0,
                 length_scales=1.0, ard: Optional[int] = None, bounds=None):
        super().__init__(active_dims)
        self.signal_variance = self._add_hp("signal_variance", signal_variance)
        ls = np.atleast_1d(np.asarray(length_scales, dtype=float))
        self.length_scales = self._add_hp("length_scales", ls)

    def _r2(self, params, x, y):
        xs, ys = self._select(x), self._select(y)
        ls = params[self.length_scales.key]
        d = (xs - ys) / ls
        return jnp.sum(d * d)


class GammaExponentialKernel(StationaryKernel):
    acronym = "GE"

    def __init__(self, active_dims=None, signal_variance=1.0, gamma: float = 1.0,
                 length_scales=1.0, alpha=None, **kw):
        super().__init__(active_dims, signal_variance, length_scales)
        if alpha is not None:
            gamma = alpha
        if not 0 < gamma <= 2:
            raise ValueError("gamma must be in (0, 2]")
        self.gamma = self._add_hp("gamma", gamma, fixed=True)

    def eval(self, params, x, y):
        r2 = self._r2(params, x, y)
        g = params[self.gamma.key]
        return params[self.signal_variance.key] ** 2 * jnp.exp(
            -0.5 * (r2 + 1e-36) ** (g / 2.0))


class SquaredExponentialKernel(StationaryKernel):
    acronym = "SE"

    def eval(self, params, x, y):
        return params[self.signal_variance.key] ** 2 * jnp.exp(
            -0.5 * self._r2(params, x, y))


class MaternKernel(StationaryKernel):
    """Matern with any half-integer smoothness nu = p + 1/2 (p = 0, 1, 2, ...),
    like the reference's generic polynomial form (reference: gp/kernel.py:783-826;
    Rasmussen & Williams eq. 4.16):
        k = sv^2 * exp(-d) * Gamma(p+1)/Gamma(2p+1)
            * sum_i (p+i)!/(i! (p-i)!) (2d)^(p-i),   d = sqrt(2 nu) * r."""

    acronym = "M"

    def __init__(self, nu: float = 1.5, active_dims=None, signal_variance=1.0,
                 length_scales=1.0, **kw):
        super().__init__(active_dims, signal_variance, length_scales)
        p = nu - 0.5
        if p < 0 or abs(p - round(p)) > 1e-12:
            raise ValueError("nu must be a half-integer: 0.5, 1.5, 2.5, 3.5, ...")
        self.nu = nu
        self._p = int(round(p))
        # static polynomial coefficients c_k of f(d) = sum_k c_k d^k
        from math import factorial
        pp = self._p
        norm = factorial(pp) / factorial(2 * pp)
        self._poly = np.array(
            [norm * factorial(pp + i) / (factorial(i) * factorial(pp - i))
             * 2.0 ** (pp - i) for i in range(pp + 1)][::-1])
        # self._poly[k] multiplies d^k (k = 0 .. p); for p=1 -> [1, 1],
        # p=2 -> [1, 1, 1/3]

    def eval(self, params, x, y):
        r = jnp.sqrt(self._r2(params, x, y) + 1e-36)
        sv = params[self.signal_variance.key] ** 2
        d = jnp.sqrt(2.0 * self.nu) * r
        f = jnp.zeros(())
        for c in self._poly[::-1]:   # Horner
            f = f * d + c
        return sv * f * jnp.exp(-d)


class ExponentialKernel(MaternKernel):
    acronym = "E"

    def __init__(self, active_dims=None, signal_variance=1.0, length_scales=1.0,
                 **kw):
        super().__init__(0.5, active_dims, signal_variance, length_scales)


class Matern32Kernel(MaternKernel):
    acronym = "M32"

    def __init__(self, active_dims=None, signal_variance=1.0, length_scales=1.0,
                 **kw):
        super().__init__(1.5, active_dims, signal_variance, length_scales)


class Matern52Kernel(MaternKernel):
    acronym = "M52"

    def __init__(self, active_dims=None, signal_variance=1.0, length_scales=1.0,
                 **kw):
        super().__init__(2.5, active_dims, signal_variance, length_scales)


class RationalQuadraticKernel(StationaryKernel):
    acronym = "RQ"

    def __init__(self, active_dims=None, signal_variance=1.0, length_scales=1.0,
                 alpha: float = 1.0, **kw):
        super().__init__(active_dims, signal_variance, length_scales)
        self.alpha = self._add_hp("alpha", alpha)

    def eval(self, params, x, y):
        r2 = self._r2(params, x, y)
        a = params[self.alpha.key]
        return params[self.signal_variance.key] ** 2 * (1.0 + r2 / (2.0 * a)) ** (-a)


class PiecewisePolynomialKernel(StationaryKernel):
    """Compact-support piecewise polynomial (Rasmussen & Williams eq. 4.21),
    q in {0, 1, 2, 3}."""

    acronym = "PP"

    def __init__(self, q: int = 0, active_dims=None, signal_variance=1.0,
                 length_scales=1.0, degree: Optional[int] = None, **kw):
        super().__init__(active_dims, signal_variance, length_scales)
        if degree is not None:
            q = degree
        if q not in (0, 1, 2, 3):
            raise ValueError("q (degree) must be one of 0, 1, 2, 3")
        self.q = int(q)

    def eval(self, params, x, y):
        xs = self._select(x)
        D = xs.shape[0] if xs.ndim else 1
        j = D // 2 + self.q + 1
        r = jnp.sqrt(self._r2(params, x, y) + 1e-36)
        base = jnp.maximum(1.0 - r, 0.0)
        q = self.q
        if q == 0:
            poly = jnp.ones(())
            e = j
        elif q == 1:
            poly = (j + 1) * r + 1.0
            e = j + 1
        elif q == 2:
            poly = ((j ** 2 + 4 * j + 3) * r ** 2 + (3 * j + 6) * r + 3.0) / 3.0
            e = j + 2
        else:
            poly = ((j ** 3 + 9 * j ** 2 + 23 * j + 15) * r ** 3
                    + (6 * j ** 2 + 36 * j + 45) * r ** 2
                    + (15 * j + 45) * r + 15.0) / 15.0
            e = j + 3
        return params[self.signal_variance.key] ** 2 * base ** e * poly


# ---------------------------------------------------------------------------
# dot-product family
# ---------------------------------------------------------------------------


class DotProductKernel(Kernel):
    acronym = "DP"

    def __init__(self, active_dims=None, signal_variance=1.0, length_scales=1.0,
                 offset: float = 1.0, **kw):
        super().__init__(active_dims)
        self.signal_variance = self._add_hp("signal_variance", signal_variance)
        ls = np.atleast_1d(np.asarray(length_scales, dtype=float))
        self.length_scales = self._add_hp("length_scales", ls)
        self.offset = self._add_hp("offset", offset, positive=False)

    def _dot(self, params, x, y):
        xs, ys = self._select(x), self._select(y)
        ls = params[self.length_scales.key]
        return jnp.sum((xs / ls) * (ys / ls)) + params[self.offset.key]

    def eval(self, params, x, y):
        return params[self.signal_variance.key] ** 2 * self._dot(params, x, y)


class PolynomialKernel(DotProductKernel):
    acronym = "Poly"

    def __init__(self, degree: int, active_dims=None, signal_variance=1.0,
                 length_scales=1.0, offset: float = 1.0, **kw):
        super().__init__(active_dims, signal_variance, length_scales, offset)
        if int(degree) < 1:
            raise ValueError("degree must be >= 1")
        self.degree = int(degree)

    def eval(self, params, x, y):
        return params[self.signal_variance.key] ** 2 * self._dot(
            params, x, y) ** self.degree


class LinearKernel(PolynomialKernel):
    acronym = "Lin"

    def __init__(self, active_dims=None, signal_variance=1.0, length_scales=1.0,
                 **kw):
        super().__init__(1, active_dims, signal_variance, length_scales,
                         offset=0.0)
        self.offset.fixed = True


class NeuralNetworkKernel(Kernel):
    """Arcsine (MLP) kernel in the reference's exact form (reference:
    gp/kernel.py:1320-1327):
        k = sv^2 * asin((1 + x.y) / (sqrt(wv^2 + 1 + x.x) * sqrt(wv^2 + 1 + y.y)))
    Both sv and wv act as standard deviations (squared in the formula)."""

    acronym = "NN"

    def __init__(self, active_dims=None, signal_variance=1.0,
                 weight_variance: float = 1.0, **kw):
        super().__init__(active_dims)
        self.signal_variance = self._add_hp("signal_variance", signal_variance)
        self.weight_variance = self._add_hp("weight_variance", weight_variance)

    def eval(self, params, x, y):
        xs, ys = self._select(x), self._select(y)
        wv2 = params[self.weight_variance.key] ** 2
        num = 1.0 + jnp.sum(xs * ys)
        den = jnp.sqrt((wv2 + 1.0 + jnp.sum(xs * xs))
                       * (wv2 + 1.0 + jnp.sum(ys * ys)))
        return params[self.signal_variance.key] ** 2 * jnp.arcsin(
            jnp.clip(num / den, -1.0, 1.0))


class PeriodicKernel(Kernel):
    acronym = "Per"

    def __init__(self, active_dims=None, signal_variance=1.0, length_scales=1.0,
                 period: float = 1.0, **kw):
        super().__init__(active_dims)
        self.signal_variance = self._add_hp("signal_variance", signal_variance)
        ls = np.atleast_1d(np.asarray(length_scales, dtype=float))
        self.length_scales = self._add_hp("length_scales", ls)
        self.period = self._add_hp("period", period)

    def eval(self, params, x, y):
        xs, ys = self._select(x), self._select(y)
        ls = params[self.length_scales.key]
        p = params[self.period.key]
        s = jnp.sin(jnp.pi * jnp.abs(xs - ys) / p) / ls
        return params[self.signal_variance.key] ** 2 * jnp.exp(
            -2.0 * jnp.sum(s * s))


# ---------------------------------------------------------------------------
# operator algebra
# ---------------------------------------------------------------------------


class KernelOperator(Kernel):
    def __init__(self, kernel_1: Kernel, kernel_2: Optional[Kernel] = None):
        super().__init__(None)
        self.kernel_1 = kernel_1
        self.kernel_2 = kernel_2

    def _check_dims(self, d: int):
        self.kernel_1._check_dims(d)
        if self.kernel_2 is not None:
            self.kernel_2._check_dims(d)

    @property
    def hyperparameters(self):
        hps = list(self.kernel_1.hyperparameters)
        if self.kernel_2 is not None:
            hps += self.kernel_2.hyperparameters
        hps += self._hyperparameters
        # de-duplicate by object identity, keep order
        seen, out = set(), []
        for hp in hps:
            if id(hp) not in seen:
                seen.add(id(hp))
                out.append(hp)
        return out


class Sum(KernelOperator):
    acronym = "Sum"

    def eval(self, params, x, y):
        return self.kernel_1.eval(params, x, y) + self.kernel_2.eval(params, x, y)


class Product(KernelOperator):
    acronym = "Prod"

    def eval(self, params, x, y):
        return self.kernel_1.eval(params, x, y) * self.kernel_2.eval(params, x, y)


class Scale(KernelOperator):
    acronym = "Scale"

    def __init__(self, kernel: Kernel, scale: float):
        super().__init__(kernel)
        self.scale = self._add_hp("scale", float(scale), fixed=True)

    def eval(self, params, x, y):
        return params[self.scale.key] * self.kernel_1.eval(params, x, y)


class Power(KernelOperator):
    acronym = "Pow"

    def __init__(self, kernel: Kernel, power: float):
        super().__init__(kernel)
        self.power = float(power)

    def eval(self, params, x, y):
        return self.kernel_1.eval(params, x, y) ** self.power


class Warp(KernelOperator):
    """Input-warping operator: k_w(x, x') = k(f(x), f(x')).

    The reference declares ``Warp(KernelOperator)`` as an empty stub
    (reference: hilo_mpc/modules/machine_learning/gp/kernel.py:1669-1670) —
    this implementation is functional: ``warp`` is any JAX-traceable map
    applied to both inputs before the base kernel, so e.g.
    ``Warp(SquaredExponentialKernel(), jnp.log1p)`` gives a log-warped SE
    kernel. The warped kernel stays positive semi-definite for any warp
    because it is the base kernel evaluated on transformed inputs.
    """

    acronym = "Warp"

    def __init__(self, kernel: Kernel, warp):
        if not callable(warp):
            raise TypeError("warp must be a callable x -> warped x")
        super().__init__(kernel)
        self.warp = warp

    def _check_dims(self, d: int):
        # the warp may change the input dimension; the base kernel sees the
        # warped space, which is unknown until evaluation — skip static checks
        pass

    def eval(self, params, x, y):
        fx = jnp.atleast_1d(jnp.asarray(self.warp(x)))
        fy = jnp.atleast_1d(jnp.asarray(self.warp(y)))
        return self.kernel_1.eval(params, fx, fy)
