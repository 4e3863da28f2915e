"""LOBPCG block eigensolver (functional.lobpcg).

The reference exposes no eigensolver (only Ritz extraction,
krypy/utils.py:1380-1465); oracles here are analytic spectra,
``numpy.linalg.eigh`` and ``scipy.linalg.eigh`` pencils.
"""

import numpy
import pytest
import scipy.linalg

import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def _check_pairs(Am, Bm, r, k, rtol=1e-8):
    """Explicit pencil-residual check of every returned pair."""
    U = numpy.asarray(r.U)
    th = numpy.asarray(r.theta)
    Bm = numpy.eye(Am.shape[0]) if Bm is None else Bm
    for i in range(k):
        num = numpy.linalg.norm(Am @ U[:, i] - th[i] * (Bm @ U[:, i]))
        den = abs(th[i]) * numpy.linalg.norm(Bm @ U[:, i])
        assert num <= max(rtol * den, 1e-12), (i, num, den)
    # B-orthonormal block
    G = U.conj().T @ Bm @ U
    assert numpy.allclose(G, numpy.eye(k), atol=1e-7)


def test_lobpcg_diagonal_smallest():
    d = numpy.linspace(1.0, 500.0, 400)
    A = ops.diagonal(jnp.asarray(d))
    r = F.lobpcg(A, k=5, which="sa", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), d[:5], rtol=1e-8)
    _check_pairs(numpy.diag(d), None, r, 5)


def test_lobpcg_diagonal_largest():
    d = numpy.linspace(1.0, 500.0, 400)
    A = ops.diagonal(jnp.asarray(d))
    r = F.lobpcg(A, k=3, which="la", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), d[-3:][::-1], rtol=1e-8)


def test_lobpcg_dense_matches_numpy():
    rng = numpy.random.default_rng(0)
    n = 120
    Br = rng.standard_normal((n, n))
    Am = (Br + Br.T) / 2
    ew = numpy.linalg.eigvalsh(Am)
    r = F.lobpcg(jnp.asarray(Am), k=4, which="sa", tol=1e-10)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), ew[:4], atol=1e-8)
    _check_pairs(Am, None, r, 4, rtol=1e-7)


def test_lobpcg_complex_hermitian():
    rng = numpy.random.default_rng(1)
    n = 100
    Br = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Am = (Br + Br.conj().T) / 2
    ew = numpy.linalg.eigvalsh(Am)
    X0 = jnp.asarray(
        rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))
    )
    r = F.lobpcg(jnp.asarray(Am), X0=X0, which="la", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(
        numpy.asarray(r.theta), ew[-3:][::-1], atol=1e-7
    )
    _check_pairs(Am, None, r, 3, rtol=1e-6)


def test_lobpcg_complex_matrix_default_start():
    """A complex MATRIX with no X0 must pin the start block's dtype:
    a real default start would make cast_matvec project the operator
    onto its real part and converge on the wrong problem (review
    finding; same guard in eigsh and svds)."""
    rng = numpy.random.default_rng(5)
    n = 60
    Br = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Am = (Br + Br.conj().T) / 2
    ew = numpy.linalg.eigvalsh(Am)
    r = F.lobpcg(jnp.asarray(Am), k=3, which="sa", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), ew[:3], atol=1e-7)


def test_lobpcg_generalized_pencil():
    """A x = lambda B x with SPD B: oracle scipy.linalg.eigh(A, B).
    Note no Binv is needed, unlike eigsh(B=...)."""
    rng = numpy.random.default_rng(2)
    n = 90
    Q = rng.standard_normal((n, n))
    Am = (Q + Q.T) / 2
    C = rng.standard_normal((n, n)) / numpy.sqrt(n)
    Bm = C @ C.T + numpy.eye(n)
    ew = scipy.linalg.eigh(Am, Bm, eigvals_only=True)
    r = F.lobpcg(jnp.asarray(Am), k=3, B=jnp.asarray(Bm), tol=1e-10)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), ew[:3], atol=1e-8)
    _check_pairs(Am, Bm, r, 3, rtol=1e-7)


def test_lobpcg_degenerate_cluster():
    """The square Laplacian's (i,j)/(j,i) eigenvalues are exactly
    degenerate; a block of width >= the multiplicity captures the whole
    cluster (no block_size plumbing needed, unlike Lanczos)."""
    nx = 24
    lap = ops.poisson_2d(nx)
    r = F.lobpcg(lap, k=4, n=nx * nx, which="sa", tol=1e-8, maxiter=300)
    assert int(r.status) == 0
    h = 1.0 / (nx + 1)
    analytic = sorted(
        (4.0 / h**2)
        * (
            numpy.sin(i * numpy.pi * h / 2) ** 2
            + numpy.sin(j * numpy.pi * h / 2) ** 2
        )
        for i in range(1, 4)
        for j in range(1, 4)
    )[:4]
    assert numpy.allclose(numpy.asarray(r.theta), analytic, rtol=1e-7)
    # the degenerate (1,2)/(2,1) pair is present as two separate pairs
    assert abs(float(r.theta[1]) - float(r.theta[2])) <= 1e-6 * abs(
        float(r.theta[1])
    )


def test_lobpcg_preconditioner_accelerates():
    """An exact-inverse preconditioner must converge far faster than no
    preconditioner on an ill-conditioned diagonal."""
    d = numpy.geomspace(1.0, 1e6, 300)
    A = ops.diagonal(jnp.asarray(d))
    Minv = ops.diagonal(jnp.asarray(1.0 / d))
    plain = F.lobpcg(A, k=2, which="sa", tol=1e-6, maxiter=400)
    prec = F.lobpcg(A, k=2, which="sa", tol=1e-6, maxiter=400, M=Minv)
    assert int(prec.status) == 0
    assert int(prec.niter) < int(plain.niter) or int(plain.status) != 0
    assert int(prec.niter) <= 60


def test_lobpcg_maxiter_honest():
    rng = numpy.random.default_rng(3)
    n = 80
    Br = rng.standard_normal((n, n))
    Am = (Br + Br.T) / 2
    r = F.lobpcg(jnp.asarray(Am), k=3, tol=1e-14, maxiter=2)
    assert int(r.status) == 1  # MAXITER
    assert int(r.niter) == 2
    # history records an entry per iteration, NaN beyond
    h = numpy.asarray(r.resnorms)
    assert numpy.isfinite(h[:3]).all() and numpy.isnan(h[3:]).all()


def test_lobpcg_x0_and_locking():
    """A given X0 containing exact eigenvectors converges immediately
    for those pairs; soft locking keeps them pinned."""
    d = numpy.linspace(1.0, 50.0, 200)
    A = ops.diagonal(jnp.asarray(d))
    X0 = numpy.zeros((200, 3))
    X0[0, 0] = 1.0  # exact first eigenvector
    X0[1, 1] = 1.0  # exact second
    X0[:, 2] = numpy.cos(numpy.arange(200) * 0.31) + 0.01
    r = F.lobpcg(A, X0=jnp.asarray(X0), which="sa", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), d[:3], rtol=1e-9)
    U = numpy.asarray(r.U)
    assert abs(abs(U[0, 0]) - 1.0) <= 1e-7


def test_lobpcg_validation_errors():
    A = jnp.eye(30)
    with pytest.raises(ValueError, match="3k <= N"):
        F.lobpcg(A, k=11)
    with pytest.raises(ValueError, match="which"):
        F.lobpcg(A, k=2, which="sm")
    with pytest.raises(ValueError, match="X0"):
        F.lobpcg(A, X0=jnp.ones(30))
    with pytest.raises(ValueError, match="n= or X0="):
        F.lobpcg(lambda v: v, k=2)
    with pytest.raises(ValueError, match="criterion"):
        F.lobpcg(A, k=2, criterion="abs")


def test_lobpcg_backward_criterion_f32():
    """Smallest pairs of an ill-conditioned operator at float32: the
    |theta|-relative test demands kappa*eps accuracy (unattainable by
    any algorithm -- roundoff along the top of the spectrum enters the
    residual scaled by ||A||), the backward-error test certifies what
    float32 can deliver -- the same split as eigsh's shift-invert
    verification."""
    d = numpy.concatenate(
        [[1.0, 2.0, 3.0], numpy.geomspace(10.0, 1e4, 509)]
    ).astype(numpy.float32)
    A = ops.diagonal(jnp.asarray(d))
    Minv = ops.diagonal(jnp.asarray(1.0 / d))
    X0 = jnp.asarray(
        numpy.stack(
            [
                numpy.cos(numpy.arange(512) * (0.7391 + 0.1137 * i))
                + 0.01 * (i + 1)
                for i in range(3)
            ],
            axis=1,
        ).astype(numpy.float32)
    )
    r = F.lobpcg(
        A, X0=X0, which="sa", M=Minv, tol=2e-6,
        criterion="backward", maxiter=200,
    )
    assert r.theta.dtype == jnp.float32
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), d[:3], rtol=1e-3)
    # the backward errors themselves certify
    assert numpy.asarray(r.pair_resnorms).max() <= 2e-6
    # the |theta|-relative criterion at the same tolerance sits below
    # the f32 attainable floor (eps*||A||/theta ~ 1e-3) and must report
    # an honest MAXITER, not converge
    r_rel = F.lobpcg(
        A, X0=X0, which="sa", M=Minv, tol=2e-6, maxiter=60,
    )
    assert int(r_rel.status) == 1


def test_lobpcg_sharded_matches_single_device():
    """8-device mesh: the sharded solve reproduces the single-device
    eigenvalues (the Gram contractions become partial dots + psum)."""
    mesh = parallel.make_mesh(8)
    nx = 16
    lap = ops.poisson_2d(nx)
    r0 = F.lobpcg(lap, k=3, n=nx * nx, which="sa", tol=1e-9)
    X0 = numpy.stack(
        [
            numpy.cos(numpy.arange(nx * nx) * (0.7391 + 0.1137 * i))
            + 0.01 * (i + 1)
            for i in range(3)
        ],
        axis=1,
    )
    X0s = parallel.shard_vector(jnp.asarray(X0).T, mesh).T
    with mesh:
        r1 = F.lobpcg(lap, X0=X0s, which="sa", tol=1e-9)
    assert int(r1.status) == 0
    assert numpy.allclose(
        numpy.asarray(r1.theta), numpy.asarray(r0.theta), rtol=1e-10
    )


def test_lobpcg_agrees_with_eigsh():
    """Cross-solver oracle: same operator, same pairs."""
    nx = 20
    lap = ops.poisson_2d(nx)
    rl = F.lobpcg(lap, k=3, n=nx * nx, which="sa", tol=1e-9, maxiter=300)
    re = F.eigsh(lap, k=3, n=nx * nx, which="sa", tol=1e-9, block_size=2)
    assert int(rl.status) == 0 and int(re.status) == 0
    assert numpy.allclose(
        numpy.asarray(rl.theta), numpy.asarray(re.theta), rtol=1e-8
    )
