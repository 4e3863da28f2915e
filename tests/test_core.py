"""Property tests for the L1 kernels: House, Givens, Projection, qr,
angles, hegedus (oracles ported from reference test/test_utils.py:102-349)."""

import numpy
import pytest
import scipy.linalg
import jax.numpy as jnp
from numpy.testing import assert_almost_equal, assert_array_almost_equal

from krypy_tpu import utils

from helpers import get_ip_Bs, get_matrices

_factors = [0.0, 1.0, 1.0j, 1.0 + 1.0j, 1e8, 1e-8]


@pytest.mark.parametrize("a", _factors)
@pytest.mark.parametrize("b", _factors)
@pytest.mark.parametrize("length", [10, 1])
def test_house(a, b, length):
    x = numpy.ones((length, 1), dtype=numpy.array([a]).dtype) * b
    x[0] = a
    x = jnp.asarray(x)

    H = utils.House(x)
    y = numpy.asarray(H.apply(x))
    I = jnp.eye(len(x))
    HI = numpy.asarray(H.apply(I))
    Hm = numpy.asarray(H.matrix())
    xn = numpy.linalg.norm(numpy.asarray(x), 2)

    # matrix() consistent with apply()
    assert numpy.linalg.norm(HI - Hm, 2) <= 1e-14
    # Hermitian and unitary/involutory
    assert numpy.linalg.norm(Hm - Hm.T.conj(), 2) <= 1e-14
    assert numpy.linalg.norm(numpy.eye(length) - Hm.T.conj() @ Hm, 2) <= 1e-14
    # |y[0]| = ||x||
    assert numpy.abs(xn - numpy.abs(y[0])) <= 1e-14 * xn
    # |alpha| = 1 and y[0] = alpha * xnorm
    assert numpy.abs(1 - numpy.abs(complex(H.alpha))) <= 1e-14
    assert (
        numpy.abs(y[0] - complex(H.alpha) * float(H.xnorm)) <= 1e-14 * xn
    )
    if y.shape[0] > 1:
        assert numpy.linalg.norm(y[1:], 2) <= 1e-14 * xn


@pytest.mark.parametrize("a", _factors)
@pytest.mark.parametrize("b", _factors)
def test_givens(a, b):
    x = numpy.array([[a], [b]])
    G = utils.Givens(x)
    y = G.apply(x)
    xn = numpy.linalg.norm(x, 2)

    I = numpy.eye(2)
    assert numpy.linalg.norm(I - G.G.T.conj() @ G.G, 2) <= 1e-14
    assert numpy.abs(xn - numpy.abs(y[0])) <= 1e-14 * xn
    assert numpy.linalg.norm(y[1], 2) <= 1e-14 * xn
    # c is real (LAPACK-style convention)
    assert abs(numpy.imag(numpy.asarray(G.c))) == 0


@pytest.mark.parametrize(
    "X",
    [
        numpy.eye(10, 1),
        numpy.eye(10, 5),
        numpy.eye(10, 5) + 1e-1 * numpy.ones((10, 5)),
        numpy.eye(10),
        numpy.zeros((10, 0)),
    ],
)
@pytest.mark.parametrize("Ys", [None, 0, 1])
@pytest.mark.parametrize("ip_B", get_ip_Bs())
@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_projection(X, Ys, ip_B, iterations):
    Y = None if Ys is None else X + Ys

    P = utils.Projection(X, Y, ip_B=ip_B, iterations=iterations)

    (N, k) = X.shape
    I = numpy.eye(N)
    z = numpy.ones((10, 1)) / numpy.sqrt(10)

    # P^2 = P
    PI = numpy.asarray(P.apply(I))
    assert_almost_equal(
        numpy.linalg.norm(numpy.asarray(P.apply(I - PI)), 2), 0, 14
    )
    if k > 0:
        # range is X
        assert_almost_equal(
            numpy.linalg.norm(X - numpy.asarray(P.apply(X)), 2), 0, 14
        )
        # kernel is Y^perp
        Yc = X if Y is None else Y
        assert_almost_equal(
            numpy.linalg.norm(
                numpy.asarray(utils.inner(jnp.asarray(Yc), I - PI, ip_B=ip_B)),
                2,
            ),
            0,
            13,
        )
    else:
        assert numpy.linalg.norm(PI) == 0

    # complement
    assert_almost_equal(
        numpy.linalg.norm(
            I - PI - numpy.asarray(P.apply_complement(I)), 2
        ),
        0,
        14,
    )

    # operator views agree with apply
    assert (
        numpy.linalg.norm(
            numpy.asarray(P.operator() * z) - numpy.asarray(P.apply(z))
        )
        == 0
    )
    assert (
        numpy.linalg.norm(
            numpy.asarray(P.operator_complement() * z)
            - numpy.asarray(P.apply_complement(z))
        )
        == 0
    )

    # matrix representation
    assert_almost_equal(
        numpy.linalg.norm(numpy.asarray(P.matrix()) - PI, 2), 0, 14
    )

    # return_Ya correctness
    a = numpy.ones((N, 1))
    Yc = X if Y is None else Y
    _, Ya = P.apply(a, return_Ya=True)
    assert_array_almost_equal(
        numpy.asarray(Ya),
        numpy.asarray(utils.inner(jnp.asarray(Yc), jnp.asarray(a), ip_B=ip_B)),
    )
    _, Ya = P.apply_complement(a, return_Ya=True)
    assert_array_almost_equal(
        numpy.asarray(Ya),
        numpy.asarray(utils.inner(jnp.asarray(Yc), jnp.asarray(a), ip_B=ip_B)),
    )


@pytest.mark.parametrize(
    "X", [numpy.eye(10, 5), scipy.linalg.hilbert(10)[:, :5]]
)
@pytest.mark.parametrize("ip_B", get_ip_Bs())
@pytest.mark.parametrize("reorthos", [0, 1, 2])
def test_qr(X, ip_B, reorthos):
    (N, k) = X.shape
    s = scipy.linalg.svd(X, compute_uv=False)
    Q, R = utils.qr(jnp.asarray(X), ip_B=ip_B, reorthos=reorthos)
    Q, R = numpy.asarray(Q), numpy.asarray(R)

    assert Q.shape == (N, k)
    assert R.shape == (k, k)
    # residual
    assert numpy.linalg.norm(Q @ R - X, 2) <= 1e-14 * max(s)
    # orthogonality (tolerance tightens with reortho count)
    orthotol = 1e-8 if reorthos < 1 else 1e-14
    assert (
        numpy.linalg.norm(
            numpy.asarray(utils.inner(jnp.asarray(Q), jnp.asarray(Q),
                                      ip_B=ip_B))
            - numpy.eye(k),
            2,
        )
        <= orthotol
    )
    # triangularity
    assert numpy.linalg.norm(numpy.tril(R, -1)) == 0


_FGs = [
    numpy.eye(10, 1),
    1j * numpy.eye(10, 1),
    numpy.eye(10, 4),
    numpy.eye(10)[:, -4:],
    numpy.eye(10, 4) @ numpy.diag([1, 1e1, 1e2, 1e3]),
]


@pytest.mark.parametrize("F", _FGs)
@pytest.mark.parametrize("G", _FGs)
@pytest.mark.parametrize("ip_B", get_ip_Bs())
@pytest.mark.parametrize("compute_vectors", [False, True])
def test_angles(F, G, ip_B, compute_vectors):
    if compute_vectors:
        theta, U, V = utils.angles(
            F, G, ip_B=ip_B, compute_vectors=True
        )
        U, V = numpy.asarray(U), numpy.asarray(V)
    else:
        theta = utils.angles(F, G, ip_B=ip_B, compute_vectors=False)
    theta = numpy.asarray(theta)

    # shape / sortedness / range
    assert theta.shape == (max(F.shape[1], G.shape[1]),)
    assert ((theta - numpy.sort(theta)) == 0).all()
    assert (theta >= 0).all()
    assert (theta <= numpy.pi / 2 + 1e-15).all()
    # pi/2 padding on dimension mismatch
    n = abs(F.shape[1] - G.shape[1])
    if n > 0:
        assert (numpy.abs(theta[-n:] - numpy.pi / 2) == 0).all()
    # 0 angles for F == G
    if F is G:
        assert numpy.linalg.norm(theta) <= 1e-15

    if compute_vectors:
        assert U.shape == F.shape
        assert V.shape == G.shape
        UV = numpy.asarray(
            utils.inner(jnp.asarray(U), jnp.asarray(V), ip_B=ip_B)
        )
        assert (
            numpy.linalg.norm(
                UV
                - numpy.diag(numpy.cos(theta))[: F.shape[1], : G.shape[1]]
            )
            <= 1e-14
        )


def _get_m():
    m = numpy.arange(1, 11).astype(float)
    m[-1] = 1.0
    return m


_x_hegedus = [numpy.ones((10, 1)), numpy.full((10, 1), 1.0j + 1)]


@pytest.mark.parametrize(
    "matrix", get_matrices(hpd=False, herm_indef=False, comp_nonsymm=False)
)
@pytest.mark.parametrize("x", _x_hegedus)
@pytest.mark.parametrize(
    "x0",
    [numpy.zeros((10, 1)), numpy.linspace(1, 5, 10).reshape((10, 1))]
    + _x_hegedus,
)
@pytest.mark.parametrize("M", [None, numpy.diag(_get_m())])
@pytest.mark.parametrize("Ml", [None, numpy.diag(_get_m())])
@pytest.mark.parametrize("ip_B", get_ip_Bs())
def test_hegedus(matrix, x, x0, M, Ml, ip_B):
    b = matrix @ x
    A = matrix

    x0new = utils.hegedus(A, b, x0, M, Ml, ip_B)

    N = len(b)
    shape = (N, N)
    A = utils.get_linearoperator(shape, A)
    M = utils.get_linearoperator(shape, M)
    Ml = utils.get_linearoperator(shape, Ml)

    b = jnp.asarray(b)
    Mlr0 = Ml * (b - A * jnp.asarray(x0))
    MMlr0_norm = float(utils.norm(Mlr0, M * Mlr0, ip_B=ip_B))

    Mlr0new = Ml * (b - A * x0new)
    MMlr0new_norm = float(utils.norm(Mlr0new, M * Mlr0new, ip_B=ip_B))

    assert MMlr0new_norm <= MMlr0_norm + 1e-13


def test_operator_algebra():
    """Composite operator algebra: sums, products, scaling, powers,
    adjoints (reference: krypy/utils.py:1365-1556)."""
    A = numpy.random.RandomState(0).randn(6, 6)
    B = numpy.random.RandomState(1).randn(6, 6)
    x = numpy.random.RandomState(2).randn(6, 2)

    Aop = utils.MatrixLinearOperator(A)
    Bop = utils.MatrixLinearOperator(B)

    assert_almost_equal(numpy.asarray((Aop + Bop) * x), (A + B) @ x, 12)
    assert_almost_equal(numpy.asarray((Aop * Bop) * x), A @ (B @ x), 12)
    assert_almost_equal(numpy.asarray((2.5 * Aop) * x), 2.5 * (A @ x), 12)
    assert_almost_equal(numpy.asarray((Aop - Bop) * x), (A - B) @ x, 12)
    assert_almost_equal(numpy.asarray((Aop**3) * x), A @ A @ A @ x, 12)
    assert_almost_equal(numpy.asarray(Aop.adj * x), A.T.conj() @ x, 12)

    Id = utils.IdentityLinearOperator((6, 6))
    assert (Aop * Id) is Aop
    assert (Id * Aop) is Aop

    Z = utils.ZeroLinearOperator((6, 6))
    assert numpy.linalg.norm(numpy.asarray(Z * x)) == 0

    D = utils.DiagonalLinearOperator(jnp.asarray(numpy.diag(A)))
    assert_almost_equal(
        numpy.asarray(D * x), numpy.diag(numpy.diag(A)) @ x, 12
    )

    # flat-vector application
    assert numpy.asarray(Aop * x[:, 0]).shape == (6,)


def test_timed_operator():
    A = numpy.eye(5)
    timer = utils.Timer()
    Aop = utils.TimedLinearOperator(utils.MatrixLinearOperator(A), timer)
    Aop * numpy.ones((5, 2))
    assert len(timer) == 1
    assert timer[0] >= 0
