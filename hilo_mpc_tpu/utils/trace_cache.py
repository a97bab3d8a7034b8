"""Cross-instance solver-trace registry.

JAX's trace/compile caches key on function identity, and every
NMPC/MHE ``setup()`` builds fresh closures — so without intervention each
controller/estimator instance pays a full retrace (seconds) even when its
configuration is identical to one built earlier in the process. The
reference builds its CasADi solver once per OBJECT
(hilo_mpc/modules/controller/mpc.py:1778-1787); this registry makes it once
per CONFIGURATION: entries map an exhaustive configuration signature —
everything baked into the traced closures (model content, horizon,
integrator spec, scaling, cost weights/references, constraint rows/values,
solver options, dtype) — to the canonical funcs/dims/options objects and
their jitted solvers. Matching instances adopt the canonical objects, so
downstream jit sites (RTI gains, batched solvers, fused loops) also hit
their caches.

Configurations that embed per-instance callables (generic costs/constraints
from fresh lambdas) key on the id of the exact function object: the same
object shares, a behaviorally-identical fresh lambda conservatively does
not. Each entry's ``keep`` list pins every object whose id() appears in its
key so ids cannot be recycled. Signatures are taken at setup() time;
mutating cost/constraint objects afterwards requires a new setup() call
(already the documented contract).
"""
from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

_TRACE_REGISTRY: OrderedDict = OrderedDict()
# LRU bound: compiled executables are pinned by their entry, so a long-lived
# process constructing many DISTINCT configurations (a test run, a sweep
# script) would otherwise grow without bound. 256 configurations comfortably
# covers any real program; evicted entries free their executables once the
# last controller instance using them is gone.
_MAX_ENTRIES = int(os.environ.get("HILO_TRACE_REGISTRY_MAX", "256"))


def clear_trace_registry() -> None:
    """Drop all shared solver traces (frees the compiled executables)."""
    _TRACE_REGISTRY.clear()


def trace_registry_stats() -> dict:
    """{'entries': #configurations, 'sites': #lazily shared jit sites}."""
    return {"entries": len(_TRACE_REGISTRY),
            "sites": sum(len(e["sites"]) for e in _TRACE_REGISTRY.values())}


def registry_lookup(sig):
    if sig is None:
        return None
    ent = _TRACE_REGISTRY.get(sig)
    if ent is not None:
        _TRACE_REGISTRY.move_to_end(sig)
    return ent


def registry_store(sig, entry: dict):
    entry.setdefault("sites", {})
    _TRACE_REGISTRY[sig] = entry
    _TRACE_REGISTRY.move_to_end(sig)
    while len(_TRACE_REGISTRY) > _MAX_ENTRIES:
        _TRACE_REGISTRY.popitem(last=False)
    return entry


def arr_key(a):
    """Hashable content key for an array-like (None passes through)."""
    if a is None:
        return None
    a = np.asarray(a)
    return (str(a.dtype), a.shape, a.tobytes())
