"""Exception hierarchy.

Mirrors the error taxonomy of the reference implementation
(krypy/utils.py:62-103) so that user code that catches these exception types
ports over unchanged.  Inside jit-compiled solver cores errors are represented
as status codes (see :mod:`krypy_tpu.functional.types`); the host-side wrapper
classes translate status codes back into these exceptions.
"""

__all__ = [
    "ArgumentError",
    "AssumptionError",
    "ConvergenceError",
    "LinearOperatorError",
    "InnerProductError",
    "RuntimeError",
]


class ArgumentError(Exception):
    """An argument is invalid (krypy analogue of ValueError)."""


class AssumptionError(Exception):
    """All arguments are valid but a mathematical assumption is violated,
    so the requested result cannot be computed."""


class ConvergenceError(Exception):
    """A method did not converge.

    Carries the solver instance in ``self.solver`` so the caller can recover
    the last iterate and the residual history (reference:
    krypy/utils.py:81-91).
    """

    def __init__(self, msg, solver):
        super().__init__(msg)
        self.solver = solver


class LinearOperatorError(Exception):
    """A LinearOperator cannot be constructed or applied."""


class InnerProductError(Exception):
    """The provided inner product appears to be indefinite."""


class RuntimeError(Exception):  # noqa: A001 - mirrors reference name
    """Errors that fit no other category."""
