"""GP likelihoods (reference: hilo_mpc/modules/machine_learning/gp/likelihood.py:
24-102 — Gaussian implemented, others declared stubs that raise on use)."""
from __future__ import annotations


class Likelihood:
    name = "likelihood"


class Gaussian(Likelihood):
    """Gaussian observation noise — the (only) supported likelihood; exact
    inference handles it in closed form (ml/gp/inference.py)."""

    name = "gaussian"


def _unsupported(name):
    class _Stub(Likelihood):
        def __init__(self, *a, **kw):
            raise NotImplementedError(
                f"{name} likelihood is not implemented (the reference declares the "
                f"same stub, gp/likelihood.py:24-102); use Gaussian")

    _Stub.__name__ = name
    return _Stub


Logistic = _unsupported("Logistic")
Laplacian = _unsupported("Laplacian")
StudentsT = _unsupported("StudentsT")
