"""Deflation-vector factories (reference: krypy/recycling/factories.py).

A factory turns the state of the last (deflated) solve into the deflation
basis for the next solve.  :class:`RitzFactory` performs a greedy search
over candidate subsets of Ritz vectors, scoring each subset with a
:mod:`~krypy_tpu.recycling.evaluators` evaluator (predicted wall-clock
time); :class:`RitzFactorySimple` picks a fixed number by criterion.
"""

import numpy as np
import jax.numpy as jnp

from .. import deflation
from ..errors import ArgumentError, AssumptionError
from . import generators

__all__ = [
    "RitzFactory",
    "RitzFactorySimple",
    "UnionFactory",
]


class _DeflationVectorFactory:
    """Abstract base class of deflation-vector factories."""

    def get(self, solver):
        """Return deflation vectors, shape ``(N, k)``."""
        raise NotImplementedError(
            "abstract base class cannot be instanciated"
        )


class RitzFactory(_DeflationVectorFactory):
    """Automatic deflation-subspace selection by greedy subset search.

    :param subset_evaluator: scores a candidate index subset (see
      :mod:`~krypy_tpu.recycling.evaluators`).
    :param subsets_generator: proposes candidate index subsets (default:
      :class:`~krypy_tpu.recycling.generators.RitzSmall`).
    :param mode: Ritz mode passed to :class:`~krypy_tpu.deflation.Ritz`.
    :param print_results: ``None`` | ``'number'`` | ``'values'`` |
      ``'timings'``.
    """

    def __init__(
        self,
        subset_evaluator,
        subsets_generator=None,
        mode="ritz",
        print_results=None,
    ):
        self.subsets_generator = (
            generators.RitzSmall()
            if subsets_generator is None
            else subsets_generator
        )
        self.subset_evaluator = subset_evaluator
        self.mode = mode
        self.print_results = print_results

    def get(self, deflated_solver):
        ritz = deflation.Ritz(deflated_solver, mode=self.mode)
        return ritz.get_vectors(self._get_best_subset(ritz))

    def _get_best_subset(self, ritz):
        """Greedy search for the subset with the smallest predicted cost.

        An :class:`AssumptionError` from the evaluator marks a candidate as
        unevaluable and it is skipped (failure-as-control-flow, reference:
        krypy/recycling/factories.py:58-63)."""
        overall_evaluations = {}

        def evaluate(subset, evaluations):
            try:
                evaluations[subset] = self.subset_evaluator.evaluate(
                    ritz, subset
                )
            except AssumptionError:
                pass  # unevaluable candidate: skip

        current_subset = frozenset()
        evaluate(current_subset, overall_evaluations)

        while True:
            remaining = set(range(len(ritz.values))).difference(
                current_subset
            )
            subsets = self.subsets_generator.generate(ritz, remaining)
            if len(subsets) == 0:
                break

            evaluations = {}
            for subset in subsets:
                evaluate(
                    frozenset(current_subset.union(subset)), evaluations
                )

            if evaluations:
                current_subset = min(evaluations, key=evaluations.get)
            else:
                # fallback: extend by the subset with smallest residual
                resnorms = [
                    np.sum(ritz.resnorms[list(subset)])
                    for subset in subsets
                ]
                current_subset = frozenset(
                    current_subset.union(subsets[int(np.argmin(resnorms))])
                )
            overall_evaluations.update(evaluations)

        if overall_evaluations:
            selection = list(
                min(overall_evaluations, key=overall_evaluations.get)
            )
        else:
            selection = []

        self._report(ritz, selection, overall_evaluations)
        return selection

    def _report(self, ritz, selection, overall_evaluations):
        if self.print_results is None:
            return
        if self.print_results == "number":
            print(f"# of selected deflation vectors: {len(selection)}")
        elif self.print_results == "values":
            print(
                f"{len(selection)} Ritz values corresponding to selected "
                "deflation vectors: "
                + ", ".join(str(el) for el in ritz.values[selection])
            )
        elif self.print_results == "timings":
            print(
                "Timings for all successfully evaluated choices of "
                "deflation vectors with corresponding Ritz values:"
            )
            for subset, time in sorted(
                overall_evaluations.items(), key=lambda item: item[1]
            ):
                print(
                    f" {time}s: "
                    + ", ".join(
                        str(el) for el in ritz.values[list(subset)]
                    )
                )
        else:
            raise ArgumentError(
                f"Invalid value `{self.print_results}` for argument "
                "`print_result`. Valid are `None`, `number`, `values` and "
                "`timings`."
            )


class RitzFactorySimple(_DeflationVectorFactory):
    """Select a fixed number of Ritz vectors by criterion.

    :param which: ``lm``/``sm`` (largest/smallest magnitude), ``lr``/``sr``
      (real part), ``li``/``si`` (imaginary part), or ``smallest_res``.
    """

    def __init__(self, mode="ritz", n_vectors=0, which="sm"):
        self.mode = mode
        self.n_vectors = n_vectors
        self.which = which

    def get(self, solver):
        ritz = deflation.Ritz(solver, mode=self.mode)
        values = ritz.values
        n_vectors = self.n_vectors
        which = self.which

        keys = {
            "lm": lambda: np.argsort(np.abs(values))[-n_vectors:],
            "sm": lambda: np.argsort(np.abs(values))[:n_vectors],
            "lr": lambda: np.argsort(np.real(values))[-n_vectors:],
            "sr": lambda: np.argsort(np.real(values))[:n_vectors],
            "li": lambda: np.argsort(np.imag(values))[-n_vectors:],
            "si": lambda: np.argsort(np.imag(values))[:n_vectors],
            "smallest_res": lambda: np.argsort(ritz.resnorms)[:n_vectors],
        }
        if which not in keys:
            raise ArgumentError(
                f"Invalid value '{which}' for 'which'. "
                "Valid are lm, sm, lr, sr, li, si and smallest_res."
            )
        return ritz.get_vectors(keys[which]())


class UnionFactory(_DeflationVectorFactory):
    """Concatenate the vectors produced by several factories."""

    def __init__(self, factories):
        self._factories = factories

    def get(self, solver):
        vectors = [factory.get(solver) for factory in self._factories]
        return jnp.column_stack(vectors)
