"""Candidate-subset generators for the greedy Ritz-subset search
(reference: krypy/recycling/generators.py)."""

import numpy as np

__all__ = ["RitzSmall", "RitzExtremal"]


class _RitzSubsetsGenerator:
    """Abstract base: propose index subsets of Ritz vectors to consider for
    deflation."""

    def generate(self, ritz, remaining_subset):
        raise NotImplementedError(
            "abstract base class cannot be instanciated"
        )


class RitzSmall(_RitzSubsetsGenerator):
    """Propose the remaining Ritz value of smallest magnitude."""

    def __init__(self, max_vectors=np.inf):
        self.max_vectors = max_vectors

    def generate(self, ritz, remaining_subset):
        remaining = list(remaining_subset)
        if (
            len(remaining) <= 1
            or len(ritz.values) - len(remaining) >= self.max_vectors
        ):
            return []
        order = np.argsort(np.abs(ritz.values[remaining]))
        return [{remaining[order[0]]}]


class RitzExtremal(_RitzSubsetsGenerator):
    """Propose extremal Ritz values.

    Self-adjoint problems: min/max of the negative and positive branches
    separately; otherwise min/max magnitude.
    """

    def __init__(self, max_vectors=np.inf):
        self.max_vectors = max_vectors

    def generate(self, ritz, remaining_subset):
        remaining = np.array(list(remaining_subset))
        if (
            len(remaining) <= 1
            or len(ritz.values) - len(remaining) >= self.max_vectors
        ):
            return []
        remaining_values = ritz.values[remaining]

        def minmax_indices(values):
            if len(values) == 0:
                return []
            order = np.argsort(values)
            indices = [order[0]]
            if len(values) > 1:
                indices.append(order[-1])
            return indices

        if ritz._deflated_solver.linear_system.self_adjoint:
            indices = []
            negative = np.where(remaining_values < 0)[0]
            positive = np.where(remaining_values > 0)[0]
            for selection in (negative, positive):
                indices += list(
                    remaining[selection][
                        minmax_indices(remaining_values[selection])
                    ]
                )
        else:
            indices = remaining[
                minmax_indices(np.abs(remaining_values))
            ]
        return [{int(i)} for i in indices]
