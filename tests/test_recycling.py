"""Recycling end-to-end tests (oracle from reference
test/test_recycling.py): solve the same planted-outlier system repeatedly,
assert correctness each round and the monotone-improvement property."""

import numpy
import pytest

from krypy_tpu import linsys, recycling

import test_linsys


@pytest.mark.parametrize(
    "Solver",
    [
        recycling.RecyclingCg,
        recycling.RecyclingMinres,
        recycling.RecyclingGmres,
    ],
)
@pytest.mark.parametrize(
    "which", ["lm", "sm", "lr", "sr", "li", "si", "smallest_res"]
)
def test_ritz_factory_simple(Solver, which):
    N = 100
    d = numpy.linspace(1, 2, N)
    d[:5] = [1e-8, 1e-4, 1e-2, 2e-2, 3e-2]
    ls = linsys.LinearSystem(
        numpy.diag(d),
        numpy.ones((N, 1)),
        normal=True,
        self_adjoint=True,
        positive_definite=True,
    )

    vector_factory = recycling.factories.RitzFactorySimple(
        n_vectors=3, which=which
    )
    recycling_solver = Solver()
    sols = []
    params = {"maxiter": 50, "tol": 1e-5, "x0": None}
    for i in range(3):
        sols.append(
            recycling_solver.solve(
                ls, vector_factory=vector_factory, **params
            )
        )
        test_linsys.check_solver(sols[-1], Solver, ls, params)
        # recycling must not increase the iteration count
        if i > 0:
            assert len(sols[-1].resnorms) <= len(sols[0].resnorms)


@pytest.mark.parametrize(
    "factory_shortcut",
    ["RitzApproxKrylov", "RitzAprioriCg"],
)
def test_automatic_factories(factory_shortcut):
    """Greedy automatic factories run end-to-end and keep correctness
    (string shortcuts from reference krypy/recycling/linsys.py:76-88)."""
    N = 50
    d = numpy.linspace(1, 2, N)
    d[:3] = [1e-4, 1e-2, 3e-2]
    ls = linsys.LinearSystem(
        numpy.diag(d),
        numpy.ones((N, 1)),
        normal=True,
        self_adjoint=True,
        positive_definite=True,
    )
    rsolver = recycling.RecyclingCg(vector_factory=factory_shortcut)
    params = {"maxiter": 50, "tol": 1e-5, "x0": None}
    sols = [rsolver.solve(ls, **params) for _ in range(2)]
    for sol in sols:
        assert sol.resnorms[-1] <= 1e-5
    # timings of both phases were recorded
    assert len(rsolver.timings["vector_factory"]) == 2
    assert len(rsolver.timings["solve"]) == 2


def test_union_factory():
    N = 40
    d = numpy.linspace(1, 2, N)
    d[0] = 1e-3
    ls = linsys.LinearSystem(
        numpy.diag(d),
        numpy.ones((N, 1)),
        normal=True,
        self_adjoint=True,
        positive_definite=True,
    )
    f1 = recycling.factories.RitzFactorySimple(n_vectors=1, which="sm")
    f2 = recycling.factories.RitzFactorySimple(n_vectors=1, which="lm")
    union = recycling.factories.UnionFactory([f1, f2])
    rsolver = recycling.RecyclingMinres(vector_factory=union)
    sol0 = rsolver.solve(ls, tol=1e-6)
    sol1 = rsolver.solve(ls, tol=1e-6)
    assert sol1.resnorms[-1] <= 1e-6
    assert len(sol1.resnorms) <= len(sol0.resnorms)
