"""GP mean functions (reference: hilo_mpc/modules/machine_learning/gp/mean.py:45-805):
Zero/One/Constant/Linear/Polynomial with the same Sum/Product/Scale/Power algebra as
the kernels."""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..hyperparameters import Hyperparameter


class Mean:
    acronym = "m"

    def __init__(self, active_dims=None):
        self.active_dims = (None if active_dims is None
                            else np.atleast_1d(np.asarray(active_dims, dtype=int)))
        self._hyperparameters: List[Hyperparameter] = []

    def _add_hp(self, name, value, positive=False, fixed=False):
        hp = Hyperparameter(f"{self.acronym}.{name}", value=value,
                            positive=positive, fixed=fixed)
        self._hyperparameters.append(hp)
        return hp

    @property
    def hyperparameters(self):
        return list(self._hyperparameters)

    def param_values(self):
        return {hp.key: (jnp.squeeze(jnp.asarray(hp.value)) if hp.size == 1
                         else jnp.asarray(hp.value))
                for hp in self.hyperparameters}

    def _select(self, x):
        if self.active_dims is None:
            return x
        return x[jnp.asarray(self.active_dims)]

    def eval(self, params, x):
        raise NotImplementedError

    def __call__(self, X):
        import jax

        X = jnp.asarray(X, dtype=jnp.result_type(float))
        if X.ndim == 1:
            X = X[:, None]
        params = self.param_values()
        return jax.vmap(lambda a: self.eval(params, a))(X)

    def __add__(self, other):
        return MeanSum(self, other if isinstance(other, Mean)
                       else ConstantMean(float(other)))

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, other):
        if isinstance(other, Mean):
            return MeanProduct(self, other)
        return MeanScale(self, float(other))

    def __rmul__(self, other):
        return self.__mul__(other)

    def __pow__(self, p):
        return MeanPower(self, float(p))


class ZeroMean(Mean):
    acronym = "zero"

    def eval(self, params, x):
        return jnp.zeros(())


class OneMean(Mean):
    acronym = "one"

    def eval(self, params, x):
        return jnp.ones(())


class ConstantMean(Mean):
    acronym = "const"

    def __init__(self, bias: float = 1.0, active_dims=None):
        super().__init__(active_dims)
        self.bias = self._add_hp("bias", bias)

    def eval(self, params, x):
        return jnp.squeeze(params[self.bias.key])


class LinearMean(Mean):
    acronym = "lin"

    def __init__(self, coefficient=1.0, active_dims=None):
        super().__init__(active_dims)
        coeff = np.atleast_1d(np.asarray(coefficient, dtype=float))
        self.coefficient = self._add_hp("coefficient", coeff)

    def eval(self, params, x):
        xs = self._select(x)
        if self.coefficient.size not in (1, xs.shape[0]):
            raise ValueError(
                f"LinearMean: {self.coefficient.size} ARD coefficients but "
                f"{xs.shape[0]} active input dimensions")
        return jnp.sum(params[self.coefficient.key] * xs)


class PolynomialMean(Mean):
    acronym = "poly"

    def __init__(self, degree: int = 2, coefficient=1.0, offset: float = 0.0,
                 active_dims=None):
        super().__init__(active_dims)
        if int(degree) < 1:
            raise ValueError("degree must be >= 1")
        self.degree = int(degree)
        coeff = np.atleast_1d(np.asarray(coefficient, dtype=float))
        self.coefficient = self._add_hp("coefficient", coeff)
        self.offset = self._add_hp("offset", offset)

    def eval(self, params, x):
        xs = self._select(x)
        if self.coefficient.size not in (1, xs.shape[0]):
            raise ValueError(
                f"PolynomialMean: {self.coefficient.size} ARD coefficients "
                f"but {xs.shape[0]} active input dimensions")
        return (jnp.sum(params[self.coefficient.key] * xs)
                + jnp.squeeze(params[self.offset.key])) ** self.degree


class MeanOperator(Mean):
    def __init__(self, m1: Mean, m2: Optional[Mean] = None):
        super().__init__(None)
        self.mean_1 = m1
        self.mean_2 = m2

    @property
    def hyperparameters(self):
        hps = list(self.mean_1.hyperparameters)
        if self.mean_2 is not None:
            hps += self.mean_2.hyperparameters
        hps += self._hyperparameters
        seen, out = set(), []
        for hp in hps:
            if id(hp) not in seen:
                seen.add(id(hp))
                out.append(hp)
        return out


class MeanSum(MeanOperator):
    acronym = "msum"

    def eval(self, params, x):
        return self.mean_1.eval(params, x) + self.mean_2.eval(params, x)


class MeanProduct(MeanOperator):
    acronym = "mprod"

    def eval(self, params, x):
        return self.mean_1.eval(params, x) * self.mean_2.eval(params, x)


class MeanScale(MeanOperator):
    acronym = "mscale"

    def __init__(self, mean: Mean, scale: float):
        super().__init__(mean)
        self.scale = float(scale)

    def eval(self, params, x):
        return self.scale * self.mean_1.eval(params, x)


class MeanPower(MeanOperator):
    acronym = "mpow"

    def __init__(self, mean: Mean, power: float):
        super().__init__(mean)
        self.power = float(power)

    def eval(self, params, x):
        return self.mean_1.eval(params, x) ** self.power
