"""Tests for Ritz extraction, bounds, intervals, polynomials, residual
norm replay (oracles from reference test/test_utils.py:554-724)."""

from math import ceil

import numpy
import pytest
import scipy.linalg
import jax.numpy as jnp
from numpy.testing import (
    assert_almost_equal,
    assert_array_almost_equal,
    assert_array_equal,
    assert_equal,
)

from krypy_tpu import utils

from helpers import (
    get_ip_Bs,
    matrix_comp_nonsymm,
    matrix_nonsymm,
    matrix_spd,
)

_matrices_herm = [matrix_spd()]
_matrices_nonherm = [matrix_nonsymm(), matrix_comp_nonsymm()]


@pytest.mark.parametrize("matrix", _matrices_herm + _matrices_nonherm)
@pytest.mark.parametrize("v", [numpy.ones((10, 1)), numpy.eye(10, 1)])
@pytest.mark.parametrize("maxiter", [1, 5, 9, 10])
@pytest.mark.parametrize("ip_B", get_ip_Bs())
@pytest.mark.parametrize("with_V", [True, False])
@pytest.mark.parametrize("type", ["ritz", "harmonic", "harmonic_improved"])
def test_ritz(matrix, v, maxiter, ip_B, with_V, type):
    is_hermitian = any(matrix is x for x in _matrices_herm)
    eig = scipy.linalg.eigh if is_hermitian else scipy.linalg.eig
    Aevals, _ = eig(matrix)
    An = numpy.linalg.norm(matrix, 2)

    A = matrix
    ortho = "house" if ip_B is None else "dmgs"
    V, H = utils.arnoldi(
        A, jnp.asarray(v), maxiter=maxiter, ortho=ortho, ip_B=ip_B
    )
    N = v.shape[0]
    n = H.shape[1]
    Aop = utils.get_linearoperator((N, N), A)

    Z = None
    if with_V:
        theta, U, resnorm, Z = utils.ritz(
            H, V=V, hermitian=is_hermitian, type=type
        )
        Z = numpy.asarray(Z)
    else:
        theta, U, resnorm = utils.ritz(
            H, hermitian=is_hermitian, type=type
        )
    theta = numpy.asarray(theta)
    U = numpy.asarray(U)
    resnorm = numpy.asarray(resnorm)
    Vn = numpy.asarray(V)

    if Z is not None:
        assert numpy.linalg.norm(Vn[:, :n] @ U - Z, 2) <= 1e-14
    else:
        Z = Vn[:, :n] @ U

    # shapes
    assert theta.shape == (n,)
    assert U.shape == (n, n)
    assert resnorm.shape == (n,)
    assert Z.shape == (N, n)
    # unit Ritz coefficient vectors
    for i in range(n):
        assert numpy.abs(numpy.linalg.norm(U[:, i], 2) - 1) <= 1e-14
    # residual norms agree with explicit residuals
    R = numpy.asarray(Aop * jnp.asarray(Z)) - Z @ numpy.diag(theta)
    for i in range(n):
        rnorm = float(utils.norm(jnp.asarray(R[:, [i]]), ip_B=ip_B))
        assert numpy.abs(rnorm - resnorm[i]) <= 1e-14 * An
    # Galerkin orthogonality per type
    if type == "ritz":
        assert (
            numpy.linalg.norm(
                numpy.asarray(
                    utils.inner(V[:, :n], jnp.asarray(R), ip_B=ip_B)
                ),
                2,
            )
            <= 1e-14 * An
        )
    elif type == "harmonic":
        AVortho = scipy.linalg.orth(
            numpy.asarray(Aop * V[:, :n])
        )
        assert (
            numpy.linalg.norm(
                numpy.asarray(
                    utils.inner(
                        jnp.asarray(AVortho), jnp.asarray(R), ip_B=ip_B
                    )
                ),
                2,
            )
            <= 1e-12 * An
        )

    # full-dimension Ritz values equal eigenvalues
    if n == N:
        Aevals_sort = numpy.argsort(numpy.abs(Aevals))
        theta_sort = numpy.argsort(numpy.abs(theta))
        assert (
            numpy.abs(Aevals[Aevals_sort] - theta[theta_sort]) <= 5e-14 * An
        ).all()


def test_gap():
    assert_almost_equal(utils.gap([1, 2], [-4, 3]), 1)
    assert_almost_equal(utils.gap(5, -5), 10)
    assert_almost_equal(utils.gap([-5, 5], -5), 0)
    assert_almost_equal(utils.gap(5, -5, mode="interval"), 10)
    assert_almost_equal(utils.gap(5, [-5, 6], mode="interval"), 1)
    assert_almost_equal(utils.gap(-5, [-5, 6], mode="interval"), 0)
    assert utils.gap([-5, 5], [0], mode="interval") is None


def test_intervals():
    Interval = utils.Interval
    Intervals = utils.Intervals

    I = Interval(-2, -1)
    J = Interval(1, 2)
    K = Interval(-10, 1.5)
    L = Interval(5)
    M = Interval(-100, -50)
    N = Interval(50, 100)

    assert (I & J) is None
    assert (I | J) is None
    assert (J & K).left == 1
    assert (J & K).right == 1.5
    assert (J | K).left == -10
    assert (J | K).right == 2

    ints = Intervals([I, M])
    assert ints.max() == -1
    assert ints.min() == -100
    assert ints.max_neg() == -1
    assert ints.min_pos() is None

    ints = Intervals([I, J, M, N])
    assert ints.max() == 100
    assert ints.min_pos() == 1
    assert ints.max_neg() == -1
    assert ints.min() == -100
    assert ints.contains(0) is False

    ints = Intervals([I, J, K, L])
    assert ints.max() == 5
    assert ints.min_pos() is None
    assert ints.max_neg() is None
    assert ints.min() == -10
    assert ints.max_abs() == 10
    assert ints.contains(0) is True
    assert_array_equal(ints.get_endpoints(), [-10, 2, 5])


def test_bound_cg():
    b = utils.BoundCG([1, 2])
    assert_almost_equal(b.eval_step(8), 1.5018239652065932e-06)
    assert ceil(b.get_step(1e-6)) == 9

    b = utils.BoundCG(
        utils.Intervals([utils.Interval(1, 1.2), utils.Interval(2)])
    )
    assert_almost_equal(b.eval_step(8), 1.5018239652065932e-06)
    assert ceil(b.get_step(1e-6)) == 9


def test_bound_minres():
    b = utils.BoundMinres([-1, 1, 2])
    assert_almost_equal(b.eval_step(8), 0.0017331035544401801)
    assert ceil(b.get_step(2e-3)) == 8

    b = utils.BoundMinres(
        utils.Intervals([utils.Interval(-2, -1), utils.Interval(2)])
    )
    assert_almost_equal(b.eval_step(8), 0.0017331035544401801)
    assert ceil(b.get_step(2e-3)) == 8

    # non-negative spectrum degrades to the CG bound
    b = utils.BoundMinres([1, 2])
    assert isinstance(b, utils.BoundCG)


@pytest.mark.parametrize(
    "roots", [[1, 2], [1, 1j], [1, 2, 1e8], [1, 2, 1e8, 1e8 + 1e-3]]
)
def test_normalized_roots_polynomial(roots):
    p = utils.NormalizedRootsPolynomial(numpy.array(roots))

    # roots map to exactly zero; origin normalized to 1
    assert_array_equal(p(numpy.array(roots)), numpy.zeros((len(roots),)))
    assert_equal(p(0), 1)

    if numpy.isrealobj(roots):
        interval = numpy.linspace(roots[0], roots[1], 100)
        candidates = p.minmax_candidates()
        c = [roots[0], roots[1]]
        for candidate in candidates:
            if roots[0] <= candidate <= roots[1]:
                c.append(candidate)
        assert_almost_equal(
            numpy.max(numpy.abs(p(interval))),
            numpy.max(numpy.abs(p(numpy.array(c)))),
            decimal=4,
        )


def test_get_residual_norms():
    """Residual-norm replay from H matches an actual GMRES run."""
    from krypy_tpu import linsys

    A = matrix_nonsymm()
    b = numpy.ones((10, 1))
    ls = linsys.LinearSystem(A, b)
    solver = linsys.Gmres(ls, tol=1e-12, store_arnoldi=True)
    resnorms = utils.get_residual_norms(solver.H)
    assert_array_almost_equal(
        resnorms[: len(solver.resnorms)], solver.resnorms, decimal=10
    )


def test_strakos():
    D = numpy.asarray(utils.strakos(5))
    assert D.shape == (5, 5)
    d = numpy.diag(D)
    assert d[0] == 0.1
    assert (numpy.diff(d) > 0).all()


def test_normal_evals_pseudospectrum():
    """Disk-union boundary: for well-separated eigenvalues the boundary
    length is the sum of full circles; overlapping disks merge."""
    from krypy_tpu import pseudospectra

    evals = numpy.array([0.0, 10.0])
    ps = pseudospectra.NormalEvals(evals)
    paths = ps.contour_paths(1.0)
    assert_almost_equal(paths.length(), 2 * 2 * numpy.pi, decimal=10)

    # strongly overlapping: less than two full circles
    evals = numpy.array([0.0, 0.5])
    paths = pseudospectra.NormalEvals(evals).contour_paths(1.0)
    assert paths.length() < 2 * 2 * numpy.pi
    # vertices lie on the union boundary: distance to nearest eval == 1
    verts = paths.vertices()
    dmin = numpy.minimum(numpy.abs(verts - 0.0), numpy.abs(verts - 0.5))
    assert numpy.allclose(dmin, 1.0, atol=1e-12)
    # no vertex lies strictly inside the other disk
    assert (dmin >= 1.0 - 1e-12).all()


def test_nonnormal_pseudospectrum():
    """Grid pseudospectrum of a Jordan-type block: boundary encircles the
    eigenvalue with radius growing with epsilon."""
    from krypy_tpu import pseudospectra

    A = numpy.array([[0.0, 1.0], [0.0, 0.0]])
    ps = pseudospectra.NonnormalMeshgrid(
        A, real_min=-2, real_max=2, real_n=101, imag_min=-2, imag_max=2,
        imag_n=101,
    )
    paths = ps.contour_paths(0.5)
    assert paths.length() > 0
    verts = paths.vertices()
    # for the 2x2 Jordan block, sigma_min(A - zI) = eps on a circle of
    # radius r with r^2 = eps * sqrt(eps^2+1) + eps^2  (about 0.809 for
    # eps=0.5); check the boundary radius approximately
    radii = numpy.abs(verts)
    assert radii.std() < 0.05
    expected = numpy.sqrt(0.5 * numpy.sqrt(0.25 + 1) + 0.25)
    assert abs(radii.mean() - expected) < 0.05
