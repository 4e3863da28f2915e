"""Partial SVD (functional.svds).

The reference has no SVD surface (square-system solvers only,
krypy/linsys.py); oracles here are dense ``numpy.linalg.svd``.
"""

import numpy
import pytest

import jax.numpy as jnp

from krypy_tpu import functional as F


def _check_triplets(Am, r, k, rtol=1e-8):
    """Explicit two-sided residual check of every returned triplet."""
    U = numpy.asarray(r.U)
    s = numpy.asarray(r.s)
    Vh = numpy.asarray(r.Vh)
    s1 = s[0]
    for i in range(k):
        assert (
            numpy.linalg.norm(Am @ Vh[i].conj() - s[i] * U[:, i])
            <= rtol * s1
        )
        assert (
            numpy.linalg.norm(Am.conj().T @ U[:, i] - s[i] * Vh[i].conj())
            <= rtol * s1
        )
    # orthonormal singular vectors
    assert numpy.allclose(U.conj().T @ U, numpy.eye(k), atol=1e-7)
    assert numpy.allclose(
        Vh @ Vh.conj().T, numpy.eye(k), atol=1e-7
    )


def test_svds_tall_matches_numpy():
    rng = numpy.random.default_rng(0)
    Am = rng.standard_normal((150, 60))
    sv = numpy.linalg.svd(Am, compute_uv=False)
    r = F.svds(jnp.asarray(Am), k=4, tol=1e-10, maxiter=300)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.s), sv[:4], rtol=1e-9)
    _check_triplets(Am, r, 4, rtol=1e-7)


def test_svds_wide_matches_numpy():
    rng = numpy.random.default_rng(1)
    Am = rng.standard_normal((50, 140))
    sv = numpy.linalg.svd(Am, compute_uv=False)
    r = F.svds(jnp.asarray(Am), k=3, tol=1e-10, maxiter=300)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.s), sv[:3], rtol=1e-9)
    _check_triplets(Am, r, 3, rtol=1e-7)


def test_svds_complex():
    rng = numpy.random.default_rng(2)
    Am = rng.standard_normal((80, 50)) + 1j * rng.standard_normal(
        (80, 50)
    )
    sv = numpy.linalg.svd(Am, compute_uv=False)
    r = F.svds(jnp.asarray(Am), k=3, tol=1e-10, maxiter=300)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.s), sv[:3], rtol=1e-8)
    _check_triplets(Am, r, 3, rtol=1e-6)


def test_svds_callable_with_adjoint():
    rng = numpy.random.default_rng(3)
    Am = rng.standard_normal((90, 40))
    Aj = jnp.asarray(Am)
    sv = numpy.linalg.svd(Am, compute_uv=False)
    r = F.svds(
        lambda v: Aj @ v,
        k=2,
        Ah=lambda y: Aj.T @ y,
        n=40,
        tol=1e-10,
        maxiter=300,
    )
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.s), sv[:2], rtol=1e-9)


def test_svds_rank_deficient_tail():
    """k beyond the numerical rank: trailing singular values come back
    ~0 with zero left vectors, certified (not NaN, not garbage)."""
    rng = numpy.random.default_rng(4)
    B = rng.standard_normal((100, 2))
    Am = B @ rng.standard_normal((2, 60))  # rank 2
    r = F.svds(jnp.asarray(Am), k=4, tol=1e-8, maxiter=300)
    s = numpy.asarray(r.s)
    sv = numpy.linalg.svd(Am, compute_uv=False)
    assert numpy.allclose(s[:2], sv[:2], rtol=1e-8)
    assert (s[2:] <= 1e-6 * s[0]).all()
    assert numpy.asarray(r.pair_resnorms).max() <= 1e-6


def test_svds_x0_overrides_k():
    """A user-supplied X0's width IS the triplet count (review finding:
    a stale k= desynchronized the triplet assembly from the inner
    eigensolve)."""
    rng = numpy.random.default_rng(5)
    Am = rng.standard_normal((40, 30))
    sv = numpy.linalg.svd(Am, compute_uv=False)
    X0 = jnp.asarray(rng.standard_normal((30, 4)))
    r = F.svds(jnp.asarray(Am), k=6, X0=X0, tol=1e-9, maxiter=300)
    assert r.s.shape == (4,)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.s), sv[:4], rtol=1e-8)


def test_svds_validation():
    with pytest.raises(ValueError, match="Ah="):
        F.svds(lambda v: v, k=2, n=30)
    with pytest.raises(ValueError, match="n= or X0="):
        F.svds(lambda v: v, k=2, Ah=lambda y: y)
