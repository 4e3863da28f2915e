"""Non-Hermitian Krylov-Schur eigensolver (functional.eigs).

The reference exposes no eigensolver (only Ritz extraction,
krypy/utils.py:1380-1465); oracles here are ``scipy.sparse.linalg.eigs``
/ ``numpy.linalg.eig`` and cross-checks against ``eigsh``.
"""

import numpy
import pytest
import scipy.sparse.linalg

import jax.numpy as jnp

from krypy_tpu import functional as F


def _match_sets(got, ref, atol, real_operator=False):
    """Eigenvalue multisets agree (order-free: conjugate-pair sorting
    is tie-broken by rounding, so compare by nearest-distance both
    ways).

    For a REAL operator the spectrum is conjugate-closed and a
    magnitude cut through a conjugate pair selects ONE member, chosen
    by rounding (ARPACK has the same ambiguity) -- with
    ``real_operator=True`` each value therefore matches either the
    reference value or its conjugate."""
    got = numpy.asarray(got)
    ref = numpy.asarray(ref)
    d = numpy.abs(got[:, None] - ref[None, :])
    if real_operator:
        d = numpy.minimum(
            d, numpy.abs(got[:, None] - ref[None, :].conj())
        )
    assert d.min(axis=0).max() <= atol, (got, ref)
    assert d.min(axis=1).max() <= atol, (got, ref)


def _check_pairs(Am, r, rtol=1e-8):
    """Explicit residual of every returned pair."""
    U = numpy.asarray(r.U)
    th = numpy.asarray(r.theta)
    for i in range(len(th)):
        num = numpy.linalg.norm(Am @ U[:, i] - th[i] * U[:, i])
        assert num <= rtol * max(abs(th[i]), 1e-12), (i, num)
        assert abs(numpy.linalg.norm(U[:, i]) - 1) < 1e-10


def test_eigs_random_real_lm():
    rng = numpy.random.default_rng(0)
    n = 200
    Am = rng.standard_normal((n, n)) / numpy.sqrt(n)
    ref = scipy.sparse.linalg.eigs(
        Am, k=4, which="LM", return_eigenvectors=False
    )
    r = F.eigs(jnp.asarray(Am), k=4, which="lm", tol=1e-10)
    assert r.status == 0
    _match_sets(r.theta, ref, atol=1e-9, real_operator=True)
    _check_pairs(Am, r, rtol=1e-9)


def test_eigs_complex_matrix():
    rng = numpy.random.default_rng(1)
    n = 150
    Am = (
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    ) / numpy.sqrt(2 * n)
    ref = scipy.sparse.linalg.eigs(
        Am, k=3, which="LM", return_eigenvectors=False
    )
    r = F.eigs(jnp.asarray(Am), k=3, which="lm", tol=1e-10)
    assert r.status == 0
    _match_sets(r.theta, ref, atol=1e-9)
    _check_pairs(Am, r, rtol=1e-9)


def test_eigs_which_grid():
    """lr/sr/li/si on a spectrum with known extremes: block-diagonal
    2x2 rotations + real outliers."""
    rng = numpy.random.default_rng(2)
    # eigenvalues: 3, -2.5, 0.5 +- 2j, and a bulk inside |z| < 1
    blocks = [numpy.array([[3.0]]), numpy.array([[-2.5]]),
              numpy.array([[0.5, 2.0], [-2.0, 0.5]])]
    bulk = rng.standard_normal((60, 60)) / numpy.sqrt(60) * 0.4
    Am = scipy.linalg.block_diag(*blocks, bulk)
    Q, _ = numpy.linalg.qr(rng.standard_normal(Am.shape))
    Am = Q @ Am @ Q.T  # hide the structure
    ew = numpy.linalg.eigvals(Am)
    for which, key in (
        ("lr", lambda z: -z.real),
        ("sr", lambda z: z.real),
        ("li", lambda z: -z.imag),
        ("si", lambda z: z.imag),
    ):
        r = F.eigs(jnp.asarray(Am), k=2, which=which, tol=1e-9,
                   max_restarts=300)
        want = ew[numpy.argsort(key(ew))[:2]]
        assert r.status == 0, which
        _match_sets(r.theta, want, atol=1e-7)


def test_eigs_convection_diffusion():
    """Nonsymmetric PDE operator from the ops library: largest-real
    part pairs vs scipy on the dense materialization."""
    from krypy_tpu import ops

    nx = 12
    N = nx * nx
    cd = ops.convection_diffusion_2d(nx, wind=(8.0, 4.0))
    Ad = numpy.column_stack(
        [numpy.asarray(cd(jnp.eye(N, dtype=jnp.float64)[:, i]))
         for i in range(N)]
    )
    ref = scipy.sparse.linalg.eigs(
        Ad, k=3, which="SM", return_eigenvectors=False, maxiter=5000
    )
    Sinv = numpy.linalg.inv(Ad)
    r = F.eigs(
        cd, k=3, n=N, sigma=0.0,
        inv=lambda v: jnp.asarray(Sinv, v.dtype) @ v, tol=1e-10,
    )
    assert r.status == 0
    _match_sets(r.theta, ref, atol=1e-6 * numpy.abs(ref).max())
    _check_pairs(Ad, r, rtol=1e-8)


def test_eigs_shift_invert_interior():
    """Pairs nearest an interior sigma, verified against the full
    spectrum; final residuals are vs A (not the inverted operator)."""
    rng = numpy.random.default_rng(5)
    n = 120
    Am = rng.standard_normal((n, n)) / numpy.sqrt(n)
    ew = numpy.linalg.eigvals(Am)
    sigma = 0.3 + 0.1j
    Sinv = numpy.linalg.inv(Am - sigma * numpy.eye(n))
    r = F.eigs(
        jnp.asarray(Am), k=3, sigma=sigma,
        inv=lambda v: jnp.asarray(Sinv) @ v, tol=1e-10,
    )
    want = ew[numpy.argsort(numpy.abs(ew - sigma))[:3]]
    assert r.status == 0
    _match_sets(r.theta, want, atol=1e-8)
    _check_pairs(Am, r, rtol=1e-8)


def test_eigs_agrees_with_eigsh_on_hermitian():
    rng = numpy.random.default_rng(3)
    n = 140
    B = rng.standard_normal((n, n))
    Am = (B + B.T) / 2
    rs = F.eigsh(jnp.asarray(Am), k=3, which="lm", tol=1e-10)
    rg = F.eigs(jnp.asarray(Am), k=3, which="lm", tol=1e-10)
    assert rg.status == 0
    assert numpy.asarray(rg.theta).imag.max() < 1e-8
    assert numpy.allclose(
        numpy.sort(numpy.asarray(rg.theta).real),
        numpy.sort(numpy.asarray(rs.theta)),
        atol=1e-8,
    )


def test_eigs_invariant_subspace():
    """Rank-5 operator: the Krylov space goes invariant long before
    maxdim; lucky breakdown must still converge."""
    rng = numpy.random.default_rng(7)
    n = 300
    U5 = rng.standard_normal((n, 5))
    W5 = rng.standard_normal((n, 5))
    Am = U5 @ numpy.diag([5.0, 4.0, 3.0, 2.0, 1.0]) @ W5.T / n
    ew = numpy.linalg.eigvals(Am)
    want = ew[numpy.argsort(-numpy.abs(ew))[:3]]
    r = F.eigs(jnp.asarray(Am), k=3, which="lm", tol=1e-9)
    assert r.status == 0
    _match_sets(r.theta, want, atol=1e-8 * numpy.abs(want).max())


def test_eigs_callable_with_n():
    rng = numpy.random.default_rng(9)
    n = 100
    Am = rng.standard_normal((n, n)) / numpy.sqrt(n)
    Aj = jnp.asarray(Am)
    ref = scipy.sparse.linalg.eigs(
        Am, k=2, which="LM", return_eigenvectors=False
    )
    r = F.eigs(lambda v: Aj.astype(v.dtype) @ v, k=2, n=n, tol=1e-10)
    assert r.status == 0
    _match_sets(r.theta, ref, atol=1e-9, real_operator=True)


def test_eigs_f32_backward():
    """f32 operator: pairs to f32-appropriate accuracy, result dtype
    complex64."""
    rng = numpy.random.default_rng(11)
    n = 150
    Am = (rng.standard_normal((n, n)) / numpy.sqrt(n)).astype(
        numpy.float32
    )
    ref = scipy.sparse.linalg.eigs(
        Am.astype(float), k=2, which="LM", return_eigenvectors=False
    )
    r = F.eigs(jnp.asarray(Am), k=2, which="lm", tol=2e-5,
               max_restarts=300)
    assert r.status == 0
    assert r.theta.dtype == jnp.complex64
    _match_sets(r.theta, ref, atol=1e-3, real_operator=True)


def test_eigs_validation():
    rng = numpy.random.default_rng(0)
    Am = jnp.asarray(rng.standard_normal((40, 40)))
    with pytest.raises(ValueError, match="which"):
        F.eigs(Am, k=2, which="xx")
    with pytest.raises(ValueError, match="requires inv"):
        F.eigs(Am, k=2, sigma=1.0)
    with pytest.raises(ValueError, match="only meaningful"):
        F.eigs(Am, k=2, inv=lambda v: v)
    with pytest.raises(ValueError, match="n= or v0="):
        F.eigs(lambda v: v, k=2)
    with pytest.raises(ValueError, match="maxdim"):
        F.eigs(Am, k=20, maxdim=21)
