"""Recycling Krylov solvers for sequences of linear systems
(reference: krypy/recycling/)."""

from . import evaluators, factories, generators  # noqa: F401
from .linsys import RecyclingCg, RecyclingGmres, RecyclingMinres

__all__ = [
    "RecyclingCg",
    "RecyclingMinres",
    "RecyclingGmres",
    "evaluators",
    "factories",
    "generators",
]
