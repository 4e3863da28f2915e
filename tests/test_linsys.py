"""Combinatorial solver battery (oracle ported from reference
test/test_linsys.py): 6 matrix classes x inner products x shapes x
preconditioners x exact solutions x initial guesses x tolerances, with the
full residual/error bookkeeping assertions.

The full case grid is large; by default a deterministic subsample runs
(every KRYPY_TPU_TEST_STRIDE-th case, default 5).  Set
``KRYPY_TPU_TEST_STRIDE=1`` for the complete battery.
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


def dictproduct(d):
    for p in itertools.product(*d.values()):
        yield dict(zip(d.keys(), p))


def dictpick(d):
    yield {}
    for k in d:
        for v in d[k]:
            yield {k: v}


def test_linear_system():
    A = numpy.diag(range(1, 11))
    exact_solution = numpy.ones((10, 1))
    b = A.dot(exact_solution)
    ls = linsys.LinearSystem(
        A, b, M=numpy.eye(10), Ml=numpy.eye(10), Mr=numpy.eye(10)
    )
    Mr, r, rnorm = ls.get_residual(
        jnp.zeros((10, 1)), compute_norm=True
    )
    assert_almost_equal(numpy.asarray(r), b)
    assert_almost_equal(numpy.asarray(r), numpy.asarray(Mr))
    assert_almost_equal(float(rnorm), numpy.linalg.norm(b, 2))

    Mr, r, rnorm = ls.get_residual(
        jnp.asarray(exact_solution), compute_norm=True
    )
    assert_almost_equal(numpy.asarray(r), numpy.zeros((10, 1)))
    assert_almost_equal(float(rnorm), 0)


def linear_systems_generator(A, **ls_kwargs):
    ip_Bs = [None, numpy.diag(numpy.arange(1, 11).astype(float))]
    xs = [
        numpy.ones((10, 1)),
        numpy.ones((10,)),
        (1 + 1j) * numpy.ones((10, 1)),
        numpy.zeros((10, 1)),
    ]
    for ip_B, x in itertools.product(ip_Bs, xs):
        if ip_B is not None and ls_kwargs.get("self_adjoint", False):
            # restore self-adjointness w.r.t. the modified inner product
            A_new = numpy.linalg.inv(ip_B).dot(A)
        else:
            A_new = A

        preconditioners = {
            "M": [None],
            "Ml": [None, numpy.linalg.inv(A_new)],
            "Mr": [None, numpy.linalg.inv(A_new)],
        }
        if ls_kwargs.get("positive_definite", False):
            preconditioners["M"].append(numpy.linalg.inv(A_new))
        if (
            numpy.linalg.norm(numpy.diag(numpy.diag(A_new)) - A_new) == 0
            and ip_B is None
        ):
            preconditioners["M"].append(
                numpy.diag(numpy.linspace(1, 10, 10))
            )

        for exact_solution in [None, x]:
            for preconditioner in dictpick(preconditioners):
                kwargs = dict(ls_kwargs)
                kwargs.update(preconditioner)
                if preconditioner.get("M") is not None:
                    kwargs["Minv"] = numpy.linalg.inv(preconditioner["M"])
                yield linsys.LinearSystem(
                    A_new,
                    A_new.dot(x),
                    ip_B=ip_B,
                    exact_solution=exact_solution,
                    **kwargs,
                )


def solver_params_generator(solver, ls):
    params_add = {}
    if solver is linsys.RestartedGmres:
        params_add = {"maxiter": [7], "max_restarts": [20]}
    solver_params = {
        "x0": [None, numpy.zeros(ls.b.shape), numpy.ones(ls.b.shape)],
        "tol": [1e-13, 1e-2],
        "maxiter": [15],
    }
    if ls.exact_solution is not None:
        solver_params["x0"].append(numpy.asarray(ls.exact_solution))
    for params in dictproduct(
        dict(list(solver_params.items()) + list(params_add.items()))
    ):
        yield params


cases = [
    {
        "A": helpers.matrix_spd(),
        "normal": True,
        "self_adjoint": True,
        "positive_definite": True,
    },
    {
        "A": helpers.matrix_hpd(),
        "normal": True,
        "self_adjoint": True,
        "positive_definite": True,
    },
    {
        "A": helpers.matrix_symm_indef(),
        "normal": True,
        "self_adjoint": True,
    },
    {
        "A": helpers.matrix_herm_indef(),
        "normal": True,
        "self_adjoint": True,
    },
    {"A": helpers.matrix_nonsymm()},
    {"A": helpers.matrix_comp_nonsymm()},
]


def generate_cases():
    count = 0
    for case in cases:
        for ls in linear_systems_generator(**case):
            solvers = [linsys.Gmres, linsys.RestartedGmres]
            if ls.self_adjoint:
                solvers.append(linsys.Minres)
            if ls.positive_definite:
                solvers.append(linsys.Cg)
            for solver in solvers:
                for params in solver_params_generator(solver, ls):
                    count += 1
                    if count % STRIDE == 0:
                        yield solver, ls, params


@pytest.mark.parametrize("args", generate_cases())
def test_solver(args):
    solver, ls, params = args
    sol = solver(ls, **params)
    check_solver(sol, solver, ls, params)


def check_solver(sol, solver, ls, params):
    b = utils.shape_vec(ls.b)
    xk = utils.shape_vec(jnp.asarray(sol.xk))
    N = b.shape[0]
    shape = (N, N)
    A = utils.get_linearoperator(shape, ls.A)
    M = utils.get_linearoperator(shape, ls.M)
    Ml = utils.get_linearoperator(shape, ls.Ml)

    # maxiter respected
    if "max_restarts" not in params:
        assert len(sol.resnorms) - 1 <= params["maxiter"]
    else:
        assert (
            len(sol.resnorms) - 1
            <= params["maxiter"] * (params["max_restarts"] + 1)
        )

    # tolerance reached (if not near machine eps)
    if params["tol"] > 1e-15:
        assert sol.resnorms[-1] <= params["tol"]

    # the FINAL reported residual norm must equal the explicitly
    # recomputed one to 14 decimals (the determinism contract)
    MMlrk, Mlrk, MMlrk_norm = ls.get_residual(xk, compute_norm=True)
    if float(ls.MMlb_norm) == 0:
        assert abs(sol.resnorms[-1]) == 0
    else:
        assert_almost_equal(
            sol.resnorms[-1],
            float(MMlrk_norm) / float(ls.MMlb_norm),
            decimal=14,
        )

    # final error norm correct
    if ls.exact_solution is not None:
        assert_almost_equal(
            sol.errnorms[-1],
            float(
                utils.norm(
                    utils.shape_vec(ls.exact_solution)
                    - utils.shape_vec(jnp.asarray(sol.xk)),
                    ip_B=ls.ip_B,
                )
            ),
        )

    # exact preconditioner: converged after one iteration
    if (
        isinstance(params.get("M"), numpy.ndarray)
        and numpy.linalg.norm(
            numpy.eye(N)
            - numpy.asarray(A * jnp.asarray(numpy.asarray(params["M"])))
        )
        < 1e-15
    ):
        assert len(sol.resnorms) <= 2

    # 0 iterations if the initial guess was already good enough
    if params["x0"] is not None:
        x0 = utils.shape_vec(jnp.asarray(params["x0"]))
        r0 = b - A * x0
        Mlr0 = Ml * r0
        MMlr0 = M * Mlr0
        norm_MMlr0 = float(
            jnp.sqrt(utils.inner(Mlr0, MMlr0, ip_B=ls.ip_B)[0, 0].real)
        )
        if (
            float(ls.MMlb_norm) != 0
            and norm_MMlr0 / float(ls.MMlb_norm) < params["tol"]
        ):
            assert len(sol.resnorms) == 1

    # GMRES finite termination within N steps
    if solver is linsys.Gmres and params.get("max_restarts", 0) == 0:
        assert len(sol.resnorms) - 1 <= b.shape[0]
