"""Subset evaluators: predict the wall-clock cost of solving the next
system with a candidate set of deflation vectors
(reference: krypy/recycling/evaluators.py).

Both evaluators turn "predicted iteration count" into "predicted seconds"
through :meth:`~krypy_tpu.deflation._DeflationMixin.estimate_time`, which
combines the analytic operation-count models with measured per-op timings
-- the timing-to-decision feedback loop of the recycling machinery.
"""

import warnings

import numpy as np

from .. import deflation, utils
from ..errors import ArgumentError, AssumptionError

__all__ = ["RitzApriori", "RitzApproxKrylov"]


class _RitzSubsetEvaluator:
    def evaluate(self, ritz, subset):
        """Return the predicted cost (seconds) of deflating ``subset``."""
        raise NotImplementedError(
            "abstract base class cannot be instanciated"
        )


class RitzApriori(_RitzSubsetEvaluator):
    """Score a subset via an a-priori bound (CG kappa-bound or MINRES
    bound) on the non-deflated Ritz values.

    :param Bound: :class:`~krypy_tpu.utils.BoundCG` or
      :class:`~krypy_tpu.utils.BoundMinres`.
    :param strategy: ``'simple'`` uses the complementary Ritz values
      directly; ``'intervals'`` inflates them to inclusion intervals from
      the residual norms and the spectral gap.
    """

    def __init__(self, Bound, tol=None, strategy="simple", deflweight=1.0):
        self.Bound = Bound
        self.tol = tol
        self.strategy = strategy
        self.deflweight = deflweight

    def evaluate(self, ritz, subset):
        ndefl = len(subset)
        if not ritz._deflated_solver.linear_system.self_adjoint:
            warnings.warn(
                "RitzApriori is designed for self-adjoint problems but "
                "the provided LinearSystem is not marked as self-adjoint."
            )
        tol = self.tol
        if tol is None:
            tol = ritz._deflated_solver.tol

        indices = list(subset)
        indices_remaining = list(
            set(range(len(ritz.values))).difference(subset)
        )

        if self.strategy == "simple":
            bound = self.Bound(ritz.values[indices_remaining])
            nsteps = bound.get_step(tol)
        elif self.strategy == "intervals":
            intervals = self._estimate_eval_intervals(
                ritz, indices, indices_remaining
            )
            bound = self.Bound(intervals)
            nsteps = bound.get_step(tol)
        else:
            raise ArgumentError(
                f"Invalid value '{self.strategy}' for argument 'strategy'. "
                "Valid are simple and intervals."
            )

        return ritz._deflated_solver.estimate_time(
            nsteps, ndefl, deflweight=self.deflweight
        )

    @staticmethod
    def _estimate_eval_intervals(
        ritz, indices, indices_remaining, eps_min=0, eps_max=0, eps_res=None
    ):
        """Inclusion intervals for the eigenvalues associated with the
        non-deflated Ritz values, from an eigenvalue inclusion theorem plus
        a gap heuristic (reference: krypy/recycling/evaluators.py:99-134)."""
        if len(indices) == 0:
            return utils.Intervals(
                [
                    utils.Interval(mu - resnorm, mu + resnorm)
                    for mu, resnorm in zip(ritz.values, ritz.resnorms)
                ]
            )
        if len(ritz.values) == len(indices):
            raise AssumptionError(
                "selection of all Ritz pairs does not allow estimation."
            )
        if eps_res is None:
            eps_res = np.max(np.abs([eps_min, eps_max]))

        delta_sel = np.linalg.norm(ritz.resnorms[indices], 2)
        delta_non_sel = np.linalg.norm(ritz.resnorms[indices_remaining], 2)
        delta = utils.gap(
            ritz.values[indices], ritz.values[indices_remaining]
        )
        mu_ints = utils.Intervals(
            [
                utils.Interval(mu + eps_min, mu + eps_max)
                for mu in ritz.values[indices]
            ]
        )
        mu_min = mu_ints.min_abs()

        if delta_sel + eps_max - eps_min >= delta:
            raise AssumptionError(
                "delta_sel + delta_non_sel + eps_max - eps_min >= delta "
                f"({delta_sel + delta_non_sel + eps_max - eps_min} >= "
                f"{delta})"
            )
        if mu_min == 0:
            raise AssumptionError("mu_min == 0 not allowed")

        eta = (delta_sel + eps_res) ** 2 * (
            1.0 / (delta - eps_max + eps_min) + 1.0 / mu_min
        )
        left = eps_min - eta
        right = eps_max + eta

        return utils.Intervals(
            [
                utils.Interval(mu + left, mu + right)
                for mu in ritz.values[indices_remaining]
            ]
        )


class RitzApproxKrylov(_RitzSubsetEvaluator):
    """Score a subset by actually predicting the residual curve of the next
    solve via :class:`~krypy_tpu.deflation.Arnoldifyer` and
    :func:`~krypy_tpu.deflation.bound_pseudo`.

    :param mode: ``'extrapolate'`` fits a geometric convergence rate to the
      predicted curve; ``'direct'`` counts predicted steps directly.
    :param pseudospectra: include pseudospectral perturbation bounds.
    """

    def __init__(
        self,
        mode="extrapolate",
        tol=None,
        pseudospectra=False,
        bound_pseudo_kwargs=None,
        deflweight=1.0,
    ):
        self._arnoldifyer = None
        self.mode = mode
        self.tol = tol
        self.pseudospectra = pseudospectra
        self.bound_pseudo_kwargs = bound_pseudo_kwargs or {}
        self.deflweight = deflweight

    def evaluate(self, ritz, subset):
        ndefl = len(subset)
        tol = self.tol if self.tol is not None else ritz._deflated_solver.tol

        # cache the Arnoldifyer per solver instance
        if (
            self._arnoldifyer is not None
            and self._arnoldifyer._deflated_solver is ritz._deflated_solver
        ):
            arnoldifyer = self._arnoldifyer
        else:
            arnoldifyer = deflation.Arnoldifyer(ritz._deflated_solver)
            self._arnoldifyer = arnoldifyer

        Wt = ritz.coeffs[:, list(subset)]
        bound = deflation.bound_pseudo(
            arnoldifyer,
            Wt,
            tol=tol,
            pseudo_type="omit" if not self.pseudospectra else "auto",
            **self.bound_pseudo_kwargs,
        )

        if len(bound) <= 1:
            raise AssumptionError("no bound computed")

        if self.mode == "direct":
            if (bound > tol).all():
                raise AssumptionError(
                    "tolerance not reached with mode==`direct`."
                )
            nsteps = (bound > tol).sum()
        elif self.mode == "extrapolate":
            # minimal overall residual reduction rate
            alpha = np.max(
                (bound[1:] / bound[0])
                ** (1.0 / np.arange(1, len(bound)))
            )
            if alpha >= 1 or alpha == 0:
                raise AssumptionError(
                    f"Cannot compute bound because alpha == {alpha} >= 1"
                )
            nsteps = np.log(tol / bound[0]) / np.log(alpha)
        else:
            raise ArgumentError(
                f"Invalid value `{self.mode}` for argument `mode`. "
                "Valid are `direct` and `extrapolate`."
            )

        return ritz._deflated_solver.estimate_time(
            nsteps, ndefl, deflweight=self.deflweight
        )
