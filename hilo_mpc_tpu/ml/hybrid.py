"""Hybrid (physics + ML) model composition.

Rebuild of the reference's hybrid-model machinery (reference: hilo_mpc/modules/
dynamic_model/dynamic_model.py:498-589 `_append_learned`, :3040-3125
`substitute_from`): a trained ANN or GP whose labels name model *parameters* replaces
those parameters with its predictions, evaluated from features that are model states/
inputs/parameters/time. Because our learned components are pure JAX functions, the
substitution is plain function composition — no symbolic graph surgery.
"""
from __future__ import annotations


import jax.numpy as jnp
import numpy as np


def _predict_fn_of(learned):
    if hasattr(learned, "predict_fn"):
        fn = learned.predict_fn()
        if hasattr(learned, "labels") and hasattr(learned, "features"):
            return fn, list(learned.features), list(learned.labels)
    raise TypeError(f"cannot compose model with {type(learned).__name__}; expected "
                    "a trained ANN or GaussianProcess (or GPArray)")


def substitute_from(model, learned) -> None:
    """In-place substitution of model parameters by learned predictions."""
    from .gp.gp import GaussianProcess, GPArray

    if isinstance(learned, GPArray):
        for gp in learned:
            substitute_from(model, gp)
        return

    if isinstance(learned, GaussianProcess):
        base_fn = learned.predict_fn()
        fn = lambda x: jnp.atleast_1d(base_fn(x)[0])  # posterior mean
        features = list(learned.features)
        labels = list(learned.labels)
    else:
        fn, features, labels = _predict_fn_of(learned)

    x_names = model.dynamical_states
    z_names = model.algebraic_states
    u_names = model.inputs
    p_names = model.parameters

    missing = [l for l in labels if l not in p_names]
    if missing:
        raise ValueError(
            f"labels {missing} are not model parameters; substitute_from replaces "
            f"parameters (have {p_names})")
    for f in features:
        if f not in x_names + z_names + u_names + p_names and f != "t":
            raise ValueError(f"feature {f!r} is not a model variable")

    keep_idx = [i for i, nm in enumerate(p_names) if nm not in labels]
    sub_idx = {nm: i for i, nm in enumerate(p_names)}
    label_pos = {nm: i for i, nm in enumerate(labels)}

    def full_p(x, z, u, p_new, t):
        env = {}
        for i, nm in enumerate(x_names):
            env[nm] = x[i]
        for i, nm in enumerate(z_names):
            env[nm] = z[i]
        for i, nm in enumerate(u_names):
            env[nm] = u[i]
        for j, i in enumerate(keep_idx):
            env[p_names[i]] = p_new[j]
        env["t"] = t
        feat = jnp.stack([env[f] * jnp.ones(()) for f in features])
        pred = jnp.atleast_1d(fn(feat))
        vals = []
        for nm in p_names:
            if nm in label_pos:
                vals.append(pred[label_pos[nm]])
            else:
                vals.append(env[nm])
        return jnp.stack([v * jnp.ones(()) for v in vals])

    def wrap(rhs):
        if rhs is None:
            return None

        def wrapped(x, z, u, p, t):
            return rhs(x, z, u, full_p(x, z, u, p, t), t)

        return wrapped

    model._ode = wrap(model._ode)
    model._alg = wrap(model._alg)
    model._meas = wrap(model._meas)
    model._quad = wrap(model._quad)
    model._p.names = [p_names[i] for i in keep_idx]
    model._equations_src = None  # composed closures are no longer DSL-reconstructible
    model._setup_done = False
    model._step = model._step_jit = None


def hybridize(model, learned):
    """`model + ann` / `model + gp`: returns a new hybrid model (reference:
    dynamic_model.py:498 `_append_learned` via Model.__add__)."""
    new = model.copy(name=f"{model.name}_hybrid", keep_solution=False)
    substitute_from(new, learned)
    return new
