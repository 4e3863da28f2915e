"""Operator input coercion: scipy sparse matrices, scipy LinearOperators,
JAX BCOO — the migration paths for reference users
(reference: krypy/utils.py:241-273)."""

import numpy
import pytest
import scipy.sparse
import scipy.sparse.linalg as spla
import jax.numpy as jnp

import krypy_tpu
from krypy_tpu import functional as F, ops, utils


def _poisson_csr(n):
    main = 2.0 * numpy.ones(n)
    off = -numpy.ones(n - 1)
    return scipy.sparse.diags([main, off, off], [0, 1, -1], format="csr")


def test_scipy_sparse_input():
    A = _poisson_csr(20)
    op = utils.get_linearoperator((20, 20), A)
    x = numpy.linspace(0, 1, 20)
    numpy.testing.assert_allclose(
        numpy.asarray(op * jnp.asarray(x)), A @ x, rtol=1e-12
    )
    # through the convenience API
    b = numpy.ones(20)
    sol, out = krypy_tpu.cg(A, b, tol=1e-10)
    assert sol is not None
    numpy.testing.assert_allclose(
        A @ numpy.asarray(sol), b, atol=1e-8
    )


def test_scipy_linearoperator_input():
    A = _poisson_csr(16)
    scipy_op = spla.aslinearoperator(A)
    op = utils.get_linearoperator((16, 16), scipy_op)
    x = numpy.linspace(0, 1, 16)
    numpy.testing.assert_allclose(
        numpy.asarray(op * jnp.asarray(x[:, None]))[:, 0], A @ x,
        rtol=1e-12,
    )
    # adjoint
    numpy.testing.assert_allclose(
        numpy.asarray(op.adj * jnp.asarray(x[:, None]))[:, 0],
        A.T @ x,
        rtol=1e-12,
    )


def test_bcoo_functional_solve():
    A = _poisson_csr(64)
    mv = ops.sparse_from_scipy(A)
    b = jnp.ones(64)
    res = F.cg(mv, b, tol=1e-10, maxiter=200)
    assert int(res.status) == F.CONVERGED
    x = numpy.asarray(res.x)
    numpy.testing.assert_allclose(A @ x, numpy.ones(64), atol=1e-8)


def test_function_linearoperator():
    d = jnp.linspace(1.0, 2.0, 12)
    op = utils.FunctionLinearOperator(
        (12, 12), jnp.float64,
        matvec=lambda x: d * x,
        rmatvec=lambda x: d * x,
    )
    X = jnp.ones((12, 3))
    numpy.testing.assert_allclose(
        numpy.asarray(op * X), numpy.asarray(d)[:, None] * numpy.ones((12, 3)),
    )
    numpy.testing.assert_allclose(
        numpy.asarray(op.adj * X), numpy.asarray(op * X)
    )


def test_shape_mismatch_raises():
    from krypy_tpu.errors import LinearOperatorError

    with pytest.raises(LinearOperatorError):
        utils.get_linearoperator((5, 5), numpy.eye(4))
