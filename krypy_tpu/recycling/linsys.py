"""Stateful recycling drivers (reference: krypy/recycling/linsys.py).

A recycling solver is constructed once and then fed a *sequence* of linear
systems via :meth:`_RecyclingSolver.solve`; between solves it extracts
deflation vectors from the previous solve through a vector factory.
"""

import jax.numpy as jnp

from .. import deflation, linsys, utils
from . import evaluators, factories

__all__ = ["RecyclingCg", "RecyclingMinres", "RecyclingGmres"]


class _RecyclingSolver:
    """Base class for recycling solvers.

    :param DeflatedSolver: deflated solver class from
      :mod:`krypy_tpu.deflation`.
    :param vector_factory: (optional) a
      :class:`~krypy_tpu.recycling.factories._DeflationVectorFactory` that
      produces deflation vectors from the last solve.  String shortcuts:
      ``'RitzApproxKrylov'``, ``'RitzAprioriCg'``, ``'RitzAprioriMinres'``.
    """

    def __init__(self, DeflatedSolver, vector_factory=None):
        self._DeflatedSolver = DeflatedSolver
        self._vector_factory = vector_factory

        #: timings of the two phases (vector factory / solve) of each call
        self.timings = utils.Timings()

        #: deflated solver instance of the last :meth:`solve` call
        self.last_solver = None

    def solve(self, linear_system, vector_factory=None, *args, **kwargs):
        """Solve ``linear_system`` with deflation vectors recycled from the
        previous solve.

        :returns: the deflated solver instance (solution in ``.xk``).
        """
        # timings need a TimedLinearSystem
        if not isinstance(linear_system, linsys.TimedLinearSystem):
            linear_system = linsys.ConvertedTimedLinearSystem(linear_system)

        with self.timings["vector_factory"]:
            if vector_factory is None:
                vector_factory = self._vector_factory

            if vector_factory == "RitzApproxKrylov":
                vector_factory = factories.RitzFactory(
                    subset_evaluator=evaluators.RitzApproxKrylov()
                )
            elif vector_factory == "RitzAprioriCg":
                vector_factory = factories.RitzFactory(
                    subset_evaluator=evaluators.RitzApriori(
                        Bound=utils.BoundCG
                    )
                )
            elif vector_factory == "RitzAprioriMinres":
                vector_factory = factories.RitzFactory(
                    subset_evaluator=evaluators.RitzApriori(
                        Bound=utils.BoundMinres
                    )
                )

            if self.last_solver is None or vector_factory is None:
                U = jnp.zeros((linear_system.N, 0))
            else:
                U = vector_factory.get(self.last_solver)

        with self.timings["solve"]:
            # recycling needs the Arnoldi data of every solve; tolerate a
            # redundant user-supplied store_arnoldi=True
            kwargs["store_arnoldi"] = True
            self.last_solver = self._DeflatedSolver(
                linear_system, U=U, *args, **kwargs
            )

        return self.last_solver


class RecyclingCg(_RecyclingSolver):
    """Recycling preconditioned CG."""

    def __init__(self, *args, **kwargs):
        super().__init__(deflation.DeflatedCg, *args, **kwargs)


class RecyclingMinres(_RecyclingSolver):
    """Recycling preconditioned MINRES."""

    def __init__(self, *args, **kwargs):
        super().__init__(deflation.DeflatedMinres, *args, **kwargs)


class RecyclingGmres(_RecyclingSolver):
    """Recycling preconditioned GMRES."""

    def __init__(self, *args, **kwargs):
        super().__init__(deflation.DeflatedGmres, *args, **kwargs)
