"""Cost and constraint building blocks for MPC/MHE.

API-shape-compatible rebuild of the reference's cost/constraint classes (reference:
hilo_mpc/util/modeling.py:38-1005 — GenericCost, QuadraticCost, GenericConstraint):
quadratic stage/terminal costs accumulate named terms with weights and references
(constant, per-step time-varying, trajectory, or path-parameterized), generic costs and
constraints are plain callables over (x, u, p, t). Everything lowers to pure functions
that the stagewise interior-point solver traces; references that change per solve travel
through the per-stage parameter vector theta.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _as_weight_matrix(weights, n: int) -> np.ndarray:
    W = np.asarray(weights, dtype=float)
    if W.ndim == 0:
        W = np.eye(n) * float(W)
    elif W.ndim == 1:
        if W.size != n:
            raise ValueError(f"got {W.size} weights for {n} variables")
        W = np.diag(W)
    elif W.shape != (n, n):
        raise ValueError(f"weight matrix shape {W.shape}, expected {(n, n)}")
    return W


@dataclasses.dataclass
class QuadTerm:
    kind: str                      # 'states' | 'inputs' | 'inputs_change' | 'measurements'
    names: List[str]
    idx: np.ndarray                # indices into the relevant vector
    W: np.ndarray                  # (n, n) weights
    ref: Optional[np.ndarray]      # constant reference, or None for zero/no reference
    trajectory_tracking: bool = False   # reference provided per-step at solve time
    path_following: bool = False        # reference is a function of the path parameter
    path_fn: Optional[Callable] = None  # theta -> (n,) reference point on the path

    @property
    def n(self) -> int:
        return len(self.idx)

    @property
    def runtime_ref(self) -> bool:
        """True if the reference values are supplied per solve through theta
        (per-step trajectory windows or refs passed to optimize(ref=...))."""
        if self.path_following:
            return False
        return self.trajectory_tracking or (self.ref is not None
                                            and self.ref.ndim == 2)


class QuadraticCost:
    """Accumulates quadratic penalty terms (reference: QuadraticCost,
    util/modeling.py:89-531). ``add_*`` mirrors the reference's incremental API."""

    def __init__(self, model):
        self._model = model
        self.terms: List[QuadTerm] = []

    @property
    def is_empty(self) -> bool:
        return not self.terms

    def _resolve(self, names, pool: Sequence[str], what: str):
        if names is None:
            names = list(pool)
        if isinstance(names, str):
            names = [names]
        idx = []
        for nm in names:
            if nm not in pool:
                raise ValueError(f"unknown {what} {nm!r}; have {list(pool)}")
            idx.append(list(pool).index(nm))
        return list(names), np.asarray(idx, dtype=int)

    def _add(self, kind, pool, names, weights, ref, trajectory_tracking,
             path_following, path_fn=None):
        names, idx = self._resolve(names, pool, kind)
        W = _as_weight_matrix(weights if weights is not None else 1.0, len(idx))
        ref_arr = None
        if ref is not None and not callable(ref):
            ref_arr = np.asarray(ref, dtype=float)
            if ref_arr.ndim == 0:
                ref_arr = np.full(len(idx), float(ref_arr))
            if ref_arr.ndim == 1 and ref_arr.size != len(idx):
                raise ValueError(f"reference has {ref_arr.size} entries for "
                                 f"{len(idx)} variables")
            if ref_arr.ndim == 2 and ref_arr.shape[1] != len(idx):
                raise ValueError(
                    f"trajectory reference has {ref_arr.shape[1]} columns "
                    f"for {len(idx)} variables")
        if callable(ref):
            path_fn = ref
            path_following = True
            ref_arr = None
        self.terms.append(QuadTerm(
            kind=kind, names=names, idx=idx, W=W, ref=ref_arr,
            trajectory_tracking=bool(trajectory_tracking),
            path_following=bool(path_following), path_fn=path_fn))
        return self

    def add_states(self, names=None, weights=None, ref=None,
                   trajectory_tracking=False, path_following=False, path_fn=None):
        return self._add("states", self._model.dynamical_states, names, weights,
                         ref, trajectory_tracking, path_following, path_fn)

    def add_inputs(self, names=None, weights=None, ref=None,
                   trajectory_tracking=False, path_following=False):
        return self._add("inputs", self._model.inputs, names, weights, ref,
                         trajectory_tracking, path_following)

    def add_inputs_change(self, names=None, weights=None):
        return self._add("inputs_change", self._model.inputs, names, weights,
                         None, False, False)

    def add_measurements(self, names=None, weights=None, ref=None,
                         trajectory_tracking=False, path_following=False):
        return self._add("measurements", self._model.measurements, names, weights,
                         ref, trajectory_tracking, path_following)

    # matrix-style access like the reference's Q/R/P properties
    def _kind_matrix(self, kind, n):
        M = np.zeros((n, n))
        for t in self.terms:
            if t.kind == kind:
                M[np.ix_(t.idx, t.idx)] += t.W
        return M

    @property
    def Q(self):
        return self._kind_matrix("states", self._model.n_x)

    @property
    def R(self):
        return self._kind_matrix("inputs", self._model.n_u)

    @property
    def n_runtime_refs(self) -> int:
        """Number of reference entries supplied per solve (through theta)."""
        return sum(t.n for t in self.terms if t.runtime_ref)


class GenericCost:
    """Arbitrary stage/terminal cost as a callable over (x, u, p, t) (reference:
    GenericCost, util/modeling.py:38)."""

    def __init__(self, model):
        self._model = model
        self._fn: Optional[Callable] = None

    @property
    def is_empty(self) -> bool:
        return self._fn is None

    @property
    def cost(self):
        return self._fn

    @cost.setter
    def cost(self, fn: Callable):
        from ..core.model import wrap_rhs

        wrapped = wrap_rhs(fn, "cost")
        self._fn = lambda x, u, p, t: jnp.squeeze(
            wrapped(x, jnp.zeros(0, x.dtype), u, p, t))

    def __call__(self, x, u, p, t):
        return self._fn(x, u, p, t)


@dataclasses.dataclass
class GenericConstraint:
    """Nonlinear stage or terminal constraint lb <= g(x, u, p, t) <= ub, optionally
    softened (reference: GenericConstraint, util/modeling.py:820-1005).

    Soft constraints use the exact quadratic/linear penalty reformulation: the NLP
    ``min f + w·eps² s.t. g <= ub + eps, eps >= 0`` has the closed-form minimizer
    eps* = relu(g - ub), so the slack never becomes a decision variable; with
    ``max_violation`` a hard constraint at ub + max_violation remains.
    """

    fn: Callable                       # canonical g(x, u, p, t) -> (m,)
    n: int
    lb: np.ndarray
    ub: np.ndarray
    is_soft: bool = False
    weight: float = 1e4                # quadratic penalty weight when soft
    linear_weight: float = 0.0         # optional l1-ish penalty (smoothed by relu)
    max_violation: Optional[np.ndarray] = None
    name: str = "constraint"

    def __post_init__(self):
        self.lb = np.broadcast_to(np.asarray(self.lb, dtype=float), (self.n,)).copy()
        self.ub = np.broadcast_to(np.asarray(self.ub, dtype=float), (self.n,)).copy()
        if self.max_violation is not None:
            self.max_violation = np.broadcast_to(
                np.asarray(self.max_violation, dtype=float), (self.n,)).copy()

    def equality_rows(self) -> np.ndarray:
        """Rows with lb == ub (handled as true equalities by the solver's
        augmented-Lagrangian path, not as tight inequality bands)."""
        if self.is_soft:
            return np.zeros(self.n, bool)
        both = np.isfinite(self.lb) & np.isfinite(self.ub)
        return both & (np.abs(self.ub - self.lb) < 1e-9)

    def hard_rows(self):
        """Static description of the hard inequality rows this constraint adds."""
        if not self.is_soft:
            eq = self.equality_rows()
            ub_rows = np.isfinite(self.ub) & ~eq
            lb_rows = np.isfinite(self.lb) & ~eq
            return ub_rows, lb_rows, self.ub, self.lb
        if self.max_violation is not None:
            ub_rows = np.isfinite(self.ub)
            lb_rows = np.isfinite(self.lb)
            return (ub_rows, lb_rows, self.ub + self.max_violation,
                    self.lb - self.max_violation)
        return (np.zeros(self.n, bool), np.zeros(self.n, bool), self.ub, self.lb)

    def penalty(self, g):
        """Soft-constraint penalty value for constraint values g."""
        if not self.is_soft:
            return 0.0
        dtype = jnp.result_type(g)
        pen = 0.0
        ub = jnp.asarray(np.where(np.isfinite(self.ub), self.ub, 1e20), dtype)
        lb = jnp.asarray(np.where(np.isfinite(self.lb), self.lb, -1e20), dtype)
        viol = jnp.maximum(g - ub, 0.0) + jnp.maximum(lb - g, 0.0)
        pen = self.weight * jnp.sum(viol ** 2)
        if self.linear_weight:
            pen = pen + self.linear_weight * jnp.sum(viol)
        return pen


def make_constraint(fn: Callable, lb=None, ub=None, n: Optional[int] = None,
                    is_soft: bool = False, weight: float = 1e4,
                    max_violation=None, name: str = "constraint",
                    probe_dims=None) -> GenericConstraint:
    """Build a GenericConstraint from a user callable with flexible signature."""
    from ..core.model import wrap_rhs

    wrapped = wrap_rhs(fn, "constraint")
    canon = lambda x, u, p, t: jnp.atleast_1d(
        wrapped(x, jnp.zeros(0, x.dtype), u, p, t))
    if n is None:
        if probe_dims is None:
            raise ValueError("pass n= (number of constraint rows)")
        nx, nu, np_ = probe_dims
        out = canon(jnp.zeros(nx), jnp.zeros(nu), jnp.zeros(np_), 0.0)
        n = out.shape[0]
    lb = -np.inf if lb is None else lb
    ub = np.inf if ub is None else ub
    return GenericConstraint(fn=canon, n=int(n), lb=lb, ub=ub, is_soft=is_soft,
                             weight=weight, max_violation=max_violation, name=name)
