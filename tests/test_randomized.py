"""Randomized low-rank primitives (rsvd, Nystrom preconditioner).

Oracles: numpy.linalg.svd singular values/subspaces on decaying-spectrum
matrices (real, complex, matvec-only with auto-derived adjoint), the
certified triplet residuals, and a measured CG iteration cap under the
Nystrom preconditioner against plain CG on the same SPD system."""

import numpy
import pytest
import jax.numpy as jnp

from krypy_tpu import functional as F


def _lowrank_plus_noise(m, n, k, seed=0, noise=1e-6):
    rng = numpy.random.RandomState(seed)
    U0 = numpy.linalg.qr(rng.randn(m, k))[0]
    V0 = numpy.linalg.qr(rng.randn(n, k))[0]
    s0 = numpy.logspace(2, 1, k)
    return U0 @ numpy.diag(s0) @ V0.T + noise * rng.randn(m, n), s0


def test_rsvd_matches_dense_svd():
    A, _ = _lowrank_plus_noise(300, 200, 10)
    r = F.rsvd(jnp.asarray(A), 10, p=10, q=2, seed=1)
    sv = numpy.linalg.svd(A, compute_uv=False)[:10]
    numpy.testing.assert_allclose(numpy.asarray(r.s), sv, rtol=1e-10)
    assert float(r.resnorms.max()) < 1e-10
    # factorization reconstructs the dominant part
    approx = numpy.asarray(r.U) * numpy.asarray(r.s) @ numpy.asarray(r.Vh)
    assert numpy.linalg.norm(A - approx, 2) < 1e-4


def test_rsvd_callable_auto_adjoint():
    A, _ = _lowrank_plus_noise(300, 200, 10, seed=3)
    Aj = jnp.asarray(A)
    r = F.rsvd(lambda x: Aj @ x, 10, n=200, p=10, q=2, seed=1,
               dtype=jnp.float64)
    sv = numpy.linalg.svd(A, compute_uv=False)[:10]
    numpy.testing.assert_allclose(numpy.asarray(r.s), sv, rtol=1e-10)


def test_rsvd_explicit_Ah():
    A, _ = _lowrank_plus_noise(120, 90, 6, seed=5)
    Aj = jnp.asarray(A)
    r = F.rsvd(lambda x: Aj @ x, 6, Ah=lambda y: Aj.T @ y, n=90,
               p=8, q=2, seed=2, dtype=jnp.float64)
    sv = numpy.linalg.svd(A, compute_uv=False)[:6]
    numpy.testing.assert_allclose(numpy.asarray(r.s), sv, rtol=1e-9)


def test_rsvd_complex():
    rng = numpy.random.RandomState(1)
    A = ((rng.randn(100, 80) + 1j * rng.randn(100, 80))
         @ numpy.diag(numpy.logspace(2, -2, 80)))
    r = F.rsvd(jnp.asarray(A), 5, p=10, q=3, seed=2)
    sv = numpy.linalg.svd(A, compute_uv=False)[:5]
    numpy.testing.assert_allclose(numpy.asarray(r.s), sv, rtol=1e-6)
    # the certified residual of the k-th triplet is gap-limited by the
    # discarded sigma_{k+1} tail, not by arithmetic
    assert float(r.resnorms.max()) < 1e-3


def test_rsvd_requires_n_for_callables():
    with pytest.raises(ValueError):
        F.rsvd(lambda x: x, 3)


def _spd_decay(N, seed=0):
    rng = numpy.random.RandomState(seed)
    Q = numpy.linalg.qr(rng.randn(N, N))[0]
    lams = numpy.r_[numpy.logspace(4, 1, 50), numpy.ones(N - 50)]
    A = (Q * lams) @ Q.T
    return 0.5 * (A + A.T), rng


def test_nystrom_preconditioner_caps_cg_iterations():
    """With the decaying head captured, preconditioned CG converges in
    a fraction of plain CG's iterations on the same system."""
    N = 500
    A, rng = _spd_decay(N)
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.randn(N))
    r_plain = F.cg(Aj, b, tol=1e-8, maxiter=2000)
    P = F.nystrom_preconditioner(Aj, 60, N, seed=0, dtype=jnp.float64)
    r_ny = F.cg(Aj, b, M=P, tol=1e-8, maxiter=2000)
    assert int(r_ny.status) == 0
    assert int(r_ny.niter) <= int(r_plain.niter) // 3
    rel = float(jnp.linalg.norm(b - Aj @ r_ny.x) / jnp.linalg.norm(b))
    assert rel <= 1e-6


def test_nystrom_preconditioner_shifted_system():
    """mu > 0: precondition A + mu I."""
    N = 400
    A, rng = _spd_decay(N, seed=2)
    mu = 0.5
    Aj = jnp.asarray(A + mu * numpy.eye(N))
    b = jnp.asarray(rng.randn(N))
    P, (U, lam) = F.nystrom_preconditioner(
        jnp.asarray(A), 60, N, mu=mu, seed=1, dtype=jnp.float64,
        return_factors=True,
    )
    assert U.shape == (N, 60) and lam.shape == (60,)
    assert bool(jnp.all(lam >= 0))
    r = F.cg(Aj, b, M=P, tol=1e-8, maxiter=1000)
    assert int(r.status) == 0
    rel = float(jnp.linalg.norm(b - Aj @ r.x) / jnp.linalg.norm(b))
    assert rel <= 1e-6


def test_nystrom_factors_approximate_spectrum():
    """The Nystrom eigenvalues track the true head of the spectrum."""
    N = 300
    A, _ = _spd_decay(N, seed=4)
    _, (U, lam) = F.nystrom_preconditioner(
        jnp.asarray(A), 30, N, seed=3, dtype=jnp.float64,
        return_factors=True,
    )
    true = numpy.linalg.eigvalsh(A)[::-1][:10]
    # Nystrom estimates are biased low by the truncated tail; a few
    # percent on a 1.15x/index decay is the expected quality
    numpy.testing.assert_allclose(
        numpy.asarray(lam)[:10], true, rtol=5e-2
    )


def test_hutchpp_trace_estimate():
    """Hutch++ with a head capturing the decaying part estimates the
    trace to ~1e-4 where a headless Hutchinson at the same matvec
    budget sits near 1e-2 (the deflated-tail variance reduction)."""
    rng = numpy.random.RandomState(0)
    N = 400
    Q = numpy.linalg.qr(rng.randn(N, N))[0]
    lams = numpy.r_[numpy.logspace(3, 1, 40), numpy.ones(N - 40) * 0.5]
    A = (Q * lams) @ Q.T
    A = 0.5 * (A + A.T)
    true = numpy.trace(A)
    est, se = F.hutchpp(jnp.asarray(A), 0, k=48, n_probes=32)
    assert abs(float(est) - true) / true < 2e-3
    assert float(se) >= 0.0

    est_small, _ = F.hutchpp(jnp.asarray(A), 0, k=2, n_probes=110)
    assert (abs(float(est) - true) < abs(float(est_small) - true))


def test_hutchpp_callable_matches_matrix():
    rng = numpy.random.RandomState(2)
    N = 200
    A = rng.randn(N, N)
    A = A @ A.T  # PSD
    Aj = jnp.asarray(A)
    e1, _ = F.hutchpp(Aj, 5, k=32, n_probes=16)
    e2, _ = F.hutchpp(lambda x: Aj @ x, 5, n=N, k=32, n_probes=16,
                      dtype=jnp.float64)
    numpy.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)


def test_hutchpp_requires_n_for_callables():
    with pytest.raises(ValueError):
        F.hutchpp(lambda x: x, 0)
