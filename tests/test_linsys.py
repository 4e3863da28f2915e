"""Combinatorial solver battery.

Coverage mirrors the reference strategy (SURVEY.md §4: matrix classes x
inner products x vector shapes x preconditioners x exact solutions x
initial guesses x tolerances, with the explicit-vs-updated residual
cross-check to 14 decimals), organized around a flat case-table builder.

The full grid is large; by default every KRYPY_TPU_TEST_STRIDE-th case
runs (default 5).  Set ``KRYPY_TPU_TEST_STRIDE=1`` for everything.
"""

import itertools
import os

import numpy
import pytest
import jax.numpy as jnp
from numpy.testing import assert_almost_equal

from krypy_tpu import linsys, utils

import helpers

STRIDE = int(os.environ.get("KRYPY_TPU_TEST_STRIDE", "5"))

#: the six numerical-property classes with their system flags
MATRIX_CLASSES = [
    (helpers.matrix_spd, dict(normal=True, self_adjoint=True,
                              positive_definite=True)),
    (helpers.matrix_hpd, dict(normal=True, self_adjoint=True,
                              positive_definite=True)),
    (helpers.matrix_symm_indef, dict(normal=True, self_adjoint=True)),
    (helpers.matrix_herm_indef, dict(normal=True, self_adjoint=True)),
    (helpers.matrix_nonsymm, dict()),
    (helpers.matrix_comp_nonsymm, dict()),
]

RHS_VECTORS = [
    numpy.ones((10, 1)),
    numpy.ones((10,)),
    (1 + 1j) * numpy.ones((10, 1)),
    numpy.zeros((10, 1)),
]


def test_linear_system():
    A = numpy.diag(range(1, 11))
    exact = numpy.ones((10, 1))
    b = A.dot(exact)
    ls = linsys.LinearSystem(
        A, b, M=numpy.eye(10), Ml=numpy.eye(10), Mr=numpy.eye(10)
    )
    MMlr, r, rnorm = ls.get_residual(jnp.zeros((10, 1)), compute_norm=True)
    assert_almost_equal(numpy.asarray(r), b)
    assert_almost_equal(numpy.asarray(r), numpy.asarray(MMlr))
    assert_almost_equal(float(rnorm), numpy.linalg.norm(b, 2))

    MMlr, r, rnorm = ls.get_residual(jnp.asarray(exact), compute_norm=True)
    assert_almost_equal(numpy.asarray(r), numpy.zeros((10, 1)))
    assert_almost_equal(float(rnorm), 0)


def _preconditioner_picks(A, flags, ip_B):
    """Yield dicts choosing at most one preconditioner slot (as the
    reference battery intends; its own generator never actually passed
    them through -- see docs/DESIGN.md §9)."""
    Ainv = numpy.linalg.inv(A)
    yield {}
    yield {"Ml": Ainv}
    yield {"Mr": Ainv}
    if flags.get("positive_definite"):
        yield {"M": Ainv, "Minv": A}
    is_diag = numpy.linalg.norm(numpy.diag(numpy.diag(A)) - A) == 0
    if is_diag and ip_B is None:
        M = numpy.diag(numpy.linspace(1, 10, 10))
        yield {"M": M, "Minv": numpy.linalg.inv(M)}


def _systems_for(make_matrix, flags):
    base = make_matrix()
    for ip_B, x in itertools.product(
        [None, numpy.diag(numpy.arange(1, 11).astype(float))], RHS_VECTORS
    ):
        if ip_B is not None and flags.get("self_adjoint"):
            # restore self-adjointness w.r.t. the modified inner product
            A = numpy.linalg.inv(ip_B) @ base
        else:
            A = base
        for exact in (None, x):
            for pre in _preconditioner_picks(A, flags, ip_B):
                yield linsys.LinearSystem(
                    A, A @ x, ip_B=ip_B, exact_solution=exact,
                    **flags, **pre,
                )


def _solver_configs(solver_cls, ls):
    extra = (
        {"maxiter": [7], "max_restarts": [20]}
        if solver_cls is linsys.RestartedGmres
        else {"maxiter": [15]}
    )
    x0s = [None, numpy.zeros(ls.b.shape), numpy.ones(ls.b.shape)]
    if ls.exact_solution is not None:
        x0s.append(numpy.asarray(ls.exact_solution))
    keys = ["x0", "tol"] + list(extra.keys())
    pools = [x0s, [1e-13, 1e-2]] + list(extra.values())
    for combo in itertools.product(*pools):
        yield dict(zip(keys, combo))


def all_cases():
    """The full battery, subsampled by STRIDE."""
    counter = 0
    for make_matrix, flags in MATRIX_CLASSES:
        for ls in _systems_for(make_matrix, flags):
            applicable = [linsys.Gmres, linsys.RestartedGmres]
            if ls.self_adjoint:
                applicable.append(linsys.Minres)
            if ls.positive_definite:
                applicable.append(linsys.Cg)
            for solver_cls in applicable:
                for params in _solver_configs(solver_cls, ls):
                    counter += 1
                    if counter % STRIDE == 0:
                        yield solver_cls, ls, params


# exported under the names the deflation battery reuses
cases = [dict(A=mk(), **fl) for mk, fl in MATRIX_CLASSES]


def linear_systems_generator(A, **flags):
    """Systems for an explicit matrix + flags (used by test_deflation)."""
    for mk, fl in MATRIX_CLASSES:
        if numpy.array_equal(mk(), A) and fl == flags:
            yield from _systems_for(mk, fl)
            return
    raise ValueError("unknown case matrix")


@pytest.mark.parametrize("args", all_cases())
def test_solver(args):
    solver_cls, ls, params = args
    sol = solver_cls(ls, **params)
    check_solver(sol, solver_cls, ls, params)


def check_solver(sol, solver_cls, ls, params):
    """The solve contract (reference assertions,
    test/test_linsys.py:166-232)."""
    b = utils.shape_vec(ls.b)
    xk = utils.shape_vec(jnp.asarray(sol.xk))
    N = b.shape[0]
    A = utils.get_linearoperator((N, N), ls.A)
    M = utils.get_linearoperator((N, N), ls.M)
    Ml = utils.get_linearoperator((N, N), ls.Ml)

    # iteration budget respected
    budget = params["maxiter"] * (params.get("max_restarts", 0) + 1)
    assert len(sol.resnorms) - 1 <= budget

    # tolerance reached (when not at machine-eps level)
    if params["tol"] > 1e-15:
        assert sol.resnorms[-1] <= params["tol"]

    # the FINAL reported residual equals the independently recomputed
    # explicit residual to 14 decimals
    _, _, rkn = ls.get_residual(xk, compute_norm=True)
    if float(ls.MMlb_norm) == 0:
        assert abs(sol.resnorms[-1]) == 0
    else:
        assert_almost_equal(
            sol.resnorms[-1], float(rkn) / float(ls.MMlb_norm), decimal=14
        )

    # error norms track the true error
    if ls.exact_solution is not None:
        assert_almost_equal(
            sol.errnorms[-1],
            float(utils.norm(
                utils.shape_vec(ls.exact_solution) - xk, ip_B=ls.ip_B
            )),
        )

    # an exact preconditioner converges in a single step (note: the
    # corresponding reference assertion was dead code -- its guard
    # `isinstance(A, ndarray)` never held after operator coercion)
    if not isinstance(ls.M, utils.IdentityLinearOperator):
        AM = numpy.asarray(A * (ls.M * jnp.eye(N)))
        if numpy.linalg.norm(numpy.eye(N) - AM) < 1e-13:
            assert len(sol.resnorms) <= 2

    # a good-enough initial guess takes zero iterations
    if params.get("x0") is not None:
        x0 = utils.shape_vec(jnp.asarray(params["x0"]))
        Mlr0 = Ml * (b - A * x0)
        MMlr0 = M * Mlr0
        r0 = float(
            jnp.sqrt(utils.inner(Mlr0, MMlr0, ip_B=ls.ip_B)[0, 0].real)
        )
        if (
            float(ls.MMlb_norm) != 0
            and r0 / float(ls.MMlb_norm) < params["tol"]
        ):
            assert len(sol.resnorms) == 1

    # GMRES terminates within N steps
    if solver_cls is linsys.Gmres and params.get("max_restarts", 0) == 0:
        assert len(sol.resnorms) - 1 <= N
