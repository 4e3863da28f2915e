"""Golden-value regression tests on the README diag system (oracle values
from reference test/test_convenience_wrappers.py -- these 13-digit
functionals double as the cross-implementation reproducibility baseline)."""

import numpy
import pytest
import jax.numpy as jnp

import krypy_tpu


@pytest.mark.parametrize(
    "method, ref",
    [
        (
            krypy_tpu.cg,
            [1004.1873775173957, 1000.0003174916551, 999.9999999997555],
        ),
        (
            krypy_tpu.gmres,
            [1004.1873724888546, 1000.0003124630923, 999.999994971191],
        ),
        (
            krypy_tpu.minres,
            [1004.187372488912, 1000.0003124632159, 999.9999949713145],
        ),
    ],
)
def test_golden(method, ref):
    tol = 1.0e-11
    A = numpy.diag([1.0e-3] + list(range(2, 101)))

    # shape conventions: (N,1) rhs gives (N,1) solution, flat gives flat
    b = numpy.ones((100, 1))
    sol, _ = method(A, b, inner_product=lambda a, b: jnp.dot(a, b))
    assert sol.shape == b.shape

    b = numpy.ones(100)
    sol, _ = method(A, b, inner_product=lambda a, b: jnp.dot(a, b))
    assert sol.shape == b.shape

    sol = numpy.asarray(sol)
    assert abs(numpy.sum(numpy.abs(sol)) - ref[0]) < tol * ref[0]
    assert abs(numpy.sqrt(numpy.dot(sol, sol)) - ref[1]) < tol * ref[1]
    assert abs(numpy.max(numpy.abs(sol)) - ref[2]) < tol * ref[2]


@pytest.mark.parametrize(
    "method, ref",
    [
        (krypy_tpu.cg, [1004.1873775173271, 1000.0003174918709, 1000.0]),
        (
            krypy_tpu.minres,
            [1004.1873774950692, 1000.0003174918709, 1000.0],
        ),
        (
            krypy_tpu.gmres,
            [1004.1873774950692, 1000.0003174918709, 1000.0],
        ),
    ],
)
def test_golden_deflated(method, ref):
    tol = 1.0e-11
    n = 100
    A = numpy.diag([1.0e-3] + list(range(2, n + 1)))
    b = numpy.ones(n)

    # deflate the eigenvector of the small eigenvalue
    U = numpy.zeros(n)
    U[0] = 1.0
    sol, _ = method(A, b, U=U)
    sol = numpy.asarray(sol)

    assert abs(numpy.sum(numpy.abs(sol)) - ref[0]) < tol * ref[0]
    assert abs(numpy.sqrt(numpy.dot(sol, sol)) - ref[1]) < tol * ref[1]
    assert abs(numpy.max(numpy.abs(sol)) - ref[2]) < tol * ref[2]


def test_custom_inner_product():
    tol = 1.0e-11
    n = 100
    A = numpy.diag([1.0e-3] + list(range(2, n + 1)))
    b = numpy.ones(n)

    def inner(a, b):
        return jnp.dot(a, b)

    sol, _ = krypy_tpu.cg(A, b, inner_product=inner)
    sol = numpy.asarray(sol)

    ref = 1004.1873775173957
    assert abs(numpy.sum(numpy.abs(sol)) - ref) < tol * ref
    ref = 1000.0003174916551
    assert abs(numpy.sqrt(numpy.dot(sol, sol)) - ref) < tol * ref
    ref = 999.9999999997555
    assert abs(numpy.max(numpy.abs(sol)) - ref) < tol * ref


def test_nonconvergence_raises_with_state():
    """ConvergenceError carries the partial solver
    (reference: krypy/utils.py:81-91, krypy/linsys.py:466-478)."""
    from krypy_tpu.errors import ConvergenceError

    A = numpy.diag([1.0e-3] + list(range(2, 101)))
    b = numpy.ones(100)
    with pytest.raises(ConvergenceError) as excinfo:
        krypy_tpu.gmres(A, b, maxiter=3, tol=1e-14)
    solver = excinfo.value.solver
    assert solver.xk is not None
    assert len(solver.resnorms) == 4
    assert solver.resnorms[-1] > 1e-14
