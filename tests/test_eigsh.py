"""Thick-restart Lanczos eigensolver (functional.eigsh).

The reference exposes Ritz extraction from existing solves
(krypy/utils.py:1380-1465) but no standalone eigensolver; oracles here
are analytic spectra and dense ``numpy.linalg.eigh``.
"""

import numpy
import pytest

import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def test_eigsh_diagonal_smallest():
    d = numpy.linspace(1.0, 500.0, 400)
    A = ops.diagonal(jnp.asarray(d))
    r = F.eigsh(A, k=5, which="sa", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), d[:5], rtol=1e-9)
    U = numpy.asarray(r.U)
    for i in range(5):
        res = numpy.linalg.norm(d * U[:, i] - float(r.theta[i]) * U[:, i])
        assert res <= 1e-6 * abs(d[-1])
    # orthonormal columns
    G = U.T @ U
    assert numpy.allclose(G, numpy.eye(5), atol=1e-10)


def test_eigsh_diagonal_largest():
    d = numpy.linspace(1.0, 500.0, 400)
    A = ops.diagonal(jnp.asarray(d))
    r = F.eigsh(A, k=3, which="la", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), d[-3:][::-1], rtol=1e-9)


def test_eigsh_dense_matches_numpy():
    rng = numpy.random.default_rng(0)
    n = 120
    B = rng.standard_normal((n, n))
    Am = (B + B.T) / 2
    ew = numpy.linalg.eigvalsh(Am)
    r = F.eigsh(jnp.asarray(Am), k=4, which="sa", tol=1e-10)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), ew[:4], atol=1e-8)


def test_eigsh_complex_matrix_default_start():
    """A complex MATRIX with no v0 must pin the start vector's dtype:
    a real default start would make cast_matvec project the operator
    onto its real part and converge on the wrong problem (review
    finding; same guard in lobpcg and svds)."""
    rng = numpy.random.default_rng(9)
    n = 70
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Am = (B + B.conj().T) / 2
    ew = numpy.linalg.eigvalsh(Am)
    r = F.eigsh(jnp.asarray(Am), k=3, which="sa", tol=1e-9)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), ew[:3], atol=1e-7)


def test_eigsh_complex_hermitian():
    rng = numpy.random.default_rng(1)
    n = 100
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Am = (B + B.conj().T) / 2
    ew = numpy.linalg.eigvalsh(Am)
    v0 = jnp.asarray(
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    )
    r = F.eigsh(jnp.asarray(Am), k=3, which="la", v0=v0, tol=1e-10)
    assert int(r.status) == 0
    assert numpy.allclose(
        numpy.asarray(r.theta), ew[-3:][::-1], atol=1e-8
    )
    U = numpy.asarray(r.U)
    res = numpy.linalg.norm(
        Am @ U - U * numpy.asarray(r.theta)[None, :]
    )
    assert res <= 1e-7 * numpy.abs(ew).max()


def test_eigsh_clustered_eigenvalues():
    """A tight cluster plus separated tail: the cluster must be resolved
    (thick restart's advantage over plain restarting)."""
    d = numpy.r_[1.0, 1.0 + 1e-6, 1.0 + 2e-6, numpy.linspace(5, 100, 200)]
    A = ops.diagonal(jnp.asarray(d))
    r = F.eigsh(A, k=3, which="sa", tol=1e-10, maxdim=30)
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), d[:3], rtol=1e-9)


def test_eigsh_feeds_deflation():
    """result.U drops straight into deflated_gmres (column convention)."""
    d = numpy.r_[1e-3, 5e-3, numpy.linspace(1, 10, 200)]
    A = ops.diagonal(jnp.asarray(d))
    b = jnp.ones(d.size, jnp.float64)
    r = F.eigsh(A, k=2, which="sa", tol=1e-10)
    plain = F.gmres(A, b, tol=1e-8, maxiter=150)
    defl = F.deflated_gmres(A, b, r.U, tol=1e-8, maxiter=150)
    assert int(defl.status) == 0
    assert int(defl.niter) < int(plain.niter)


def test_eigsh_budget_honesty():
    """An unreachable budget reports MAXITER, never false convergence."""
    d = numpy.linspace(1.0, 1e6, 3000)
    A = ops.diagonal(jnp.asarray(d, dtype=jnp.float32))
    r = F.eigsh(
        A, k=4, which="sa", tol=1e-14, maxdim=12, max_restarts=1,
        v0=jnp.ones(3000, jnp.float32),
    )
    assert int(r.status) != 0
    assert bool(jnp.all(jnp.isfinite(r.theta)))


def test_eigsh_jit_and_sharded():
    mesh = parallel.make_mesh(8)
    d = numpy.linspace(1.0, 64.0, 1024).astype(numpy.float32)
    dj = jnp.asarray(d)
    Aop = lambda v: dj.astype(v.dtype) * v
    v0 = parallel.shard_vector(jnp.ones(1024, jnp.float32), mesh)
    with mesh:
        r = jax.jit(
            lambda v: F.eigsh(Aop, k=3, which="la", v0=v, tol=1e-5)
        )(v0)
    assert int(r.status) == 0
    assert numpy.allclose(
        numpy.asarray(r.theta), d[-3:][::-1], rtol=1e-4
    )
    assert len({s.device for s in r.U.addressable_shards}) == 8


def test_eigsh_shift_invert_interior():
    """Interior eigenvalues of the 1-D Laplacian nearest sigma, with the
    inverse applied by a compiled MINRES on the (indefinite) shifted
    operator -- the whole inner-outer eigensolve traces into one
    program."""
    n = 300
    lap = ops.poisson_1d(n)
    h = 1.0 / (n + 1)
    exact = (4.0 / h**2) * numpy.sin(
        numpy.arange(1, n + 1) * numpy.pi * h / 2
    ) ** 2
    sigma = float(exact[105]) * 1.001
    shifted = lambda v: lap(v) - sigma * v
    inv = lambda r: F.minres(shifted, r, tol=1e-12, maxiter=800).x
    r = F.eigsh(lap, k=3, sigma=sigma, inv=inv, tol=1e-8, maxdim=20)
    assert int(r.status) == 0
    got = numpy.sort(numpy.asarray(r.theta))
    want = numpy.sort(
        exact[numpy.argsort(numpy.abs(exact - sigma))[:3]]
    )
    assert numpy.allclose(got, want, rtol=1e-10)


def test_eigsh_shift_invert_verifies_against_A():
    """A sloppy inner solver must NOT yield false convergence: the final
    residuals are recomputed against A itself."""
    n = 200
    lap = ops.poisson_1d(n)
    sigma = 5e4
    shifted = lambda v: lap(v) - sigma * v
    sloppy = lambda r: F.minres(shifted, r, tol=0.3, maxiter=8).x
    r = F.eigsh(
        lap, k=2, sigma=sigma, inv=sloppy, tol=1e-10, maxdim=16,
        max_restarts=5,
    )
    assert int(r.status) != 0


def test_eigsh_shift_invert_requires_inv():
    with pytest.raises(ValueError, match="inv"):
        F.eigsh(jnp.eye(20), k=2, sigma=1.0)


def test_eigsh_guards():
    with pytest.raises(ValueError, match="n= or v0="):
        F.eigsh(lambda v: v, k=2)
    with pytest.raises(ValueError, match="maxdim"):
        F.eigsh(jnp.eye(50), k=10, maxdim=10)
    with pytest.raises(ValueError, match="which"):
        F.eigsh(jnp.eye(50), k=2, which="zz")


def test_eigsh_early_invariance_excludes_dead_block():
    """Operator with few distinct eigenvalues reachable from v0: the
    dead (deflated) Lanczos block's exact-zero eigenvalues must NOT win
    smallest-eigenvalue selection (code-review finding: 'sa' on an SPD
    operator returned zero eigenpairs as CONVERGED)."""
    # 5 distinct eigenvalues, all >= 2; Krylov space is 5-dimensional
    d = numpy.repeat(numpy.array([2.0, 3.0, 5.0, 8.0, 13.0]), 40)
    A = ops.diagonal(jnp.asarray(d))
    r = F.eigsh(A, k=3, which="sa", tol=1e-10, maxdim=24)
    assert int(r.status) == 0
    assert numpy.allclose(
        numpy.asarray(r.theta), [2.0, 3.0, 5.0], atol=1e-9
    )
    U = numpy.asarray(r.U)
    assert numpy.all(numpy.linalg.norm(U, axis=0) > 0.9)


def test_eigsh_fewer_reachable_pairs_than_k_is_honest():
    """Only 2 reachable eigenpairs but k=3: must NOT claim convergence
    with a fabricated zero pair."""
    d = numpy.repeat(numpy.array([2.0, 7.0]), 30)
    A = ops.diagonal(jnp.asarray(d))
    r = F.eigsh(A, k=3, which="sa", tol=1e-10, maxdim=10,
                max_restarts=3)
    assert int(r.status) != 0


def test_eigsh_generalized_diagonal_pencil():
    """A x = lambda B x with diagonal pencil: eigenvalues a_i/m_i, U
    B-orthonormal."""
    n = 300
    a = numpy.linspace(1.0, 200.0, n)
    mb = numpy.linspace(0.5, 3.0, n)
    A = ops.diagonal(jnp.asarray(a))
    B = ops.diagonal(jnp.asarray(mb))
    Binv = ops.diagonal(jnp.asarray(1.0 / mb))
    r = F.eigsh(A, k=4, which="sa", B=B, Binv=Binv, tol=1e-10,
                maxdim=40)
    assert int(r.status) == 0
    want = numpy.sort(a / mb)[:4]
    assert numpy.allclose(numpy.asarray(r.theta), want, rtol=1e-9)
    U = numpy.asarray(r.U)
    G = U.T @ (mb[:, None] * U)
    assert numpy.allclose(G, numpy.eye(4), atol=1e-10)


def test_eigsh_generalized_dense_matches_scipy():
    import numpy.linalg as la
    import scipy.linalg

    rng = numpy.random.default_rng(5)
    n = 120
    Bd = rng.standard_normal((n, n))
    Bd = Bd @ Bd.T + n * numpy.eye(n)
    Ad = rng.standard_normal((n, n))
    Ad = (Ad + Ad.T) / 2
    w = scipy.linalg.eigh(Ad, Bd, eigvals_only=True)
    r = F.eigsh(
        jnp.asarray(Ad), k=3, which="sa", B=jnp.asarray(Bd),
        Binv=jnp.asarray(la.inv(Bd)), tol=1e-10, maxdim=40,
    )
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), w[:3], atol=1e-8)


def test_eigsh_generalized_guards():
    A = jnp.eye(20)
    with pytest.raises(ValueError, match="BOTH"):
        F.eigsh(A, k=2, B=jnp.eye(20))
    # sigma with B requires inv (the pencil solve)
    with pytest.raises(ValueError, match="inv="):
        F.eigsh(A, k=2, B=jnp.eye(20), Binv=jnp.eye(20), sigma=1.0)


def test_eigsh_generalized_shift_invert():
    """Interior eigenvalues of the pencil A x = lam B x nearest sigma:
    Lanczos on (A - sigma B)^{-1} B in the B-inner product (Binv not
    needed).  Oracle: scipy.linalg.eigh(A, B)."""
    import scipy.linalg

    n = 150
    rng = numpy.random.RandomState(7)
    Q = numpy.linalg.qr(rng.randn(n, n))[0]
    A = Q @ numpy.diag(numpy.linspace(1.0, 50.0, n)) @ Q.T
    A = (A + A.T) / 2
    Bd = numpy.linspace(0.5, 2.0, n)
    B = numpy.diag(Bd)
    exact = scipy.linalg.eigh(A, B, eigvals_only=True)
    sigma = float(exact[n // 2]) * 1.0007

    Aj = jnp.asarray(A)
    shifted = jnp.asarray(A - sigma * B)
    inv = lambda v: jnp.linalg.solve(shifted, v)
    r = F.eigsh(
        Aj, k=3, sigma=sigma, inv=inv,
        B=lambda v: jnp.asarray(Bd) * v, maxdim=24, tol=1e-8, n=n,
    )
    assert int(r.status) == 0
    got = numpy.sort(numpy.asarray(r.theta))
    want = numpy.sort(exact[numpy.argsort(numpy.abs(exact - sigma))[:3]])
    numpy.testing.assert_allclose(got, want, rtol=1e-8)
    # U columns are B-orthonormal
    U = numpy.asarray(r.U)
    G = U.T @ (Bd[:, None] * U)
    numpy.testing.assert_allclose(G, numpy.eye(3), atol=1e-6)
    assert numpy.all(numpy.asarray(r.pair_resnorms) <= 1e-8)


def test_eigsh_generalized_sloppy_binv_is_honest():
    """An inconsistent Binv must fail the pencil verification, not
    report CONVERGED garbage."""
    n = 100
    a = numpy.linspace(1.0, 50.0, n)
    mb = numpy.linspace(0.5, 2.0, n)
    A = ops.diagonal(jnp.asarray(a))
    B = ops.diagonal(jnp.asarray(mb))
    wrong_Binv = ops.diagonal(jnp.asarray(1.0 / (mb + 0.3)))
    r = F.eigsh(A, k=3, which="sa", B=B, Binv=wrong_Binv, tol=1e-10,
                maxdim=30, max_restarts=10)
    assert int(r.status) != 0


def _laplacian_low_spectrum(nx, count):
    import itertools

    h = 1.0 / (nx + 1)
    vals = sorted(
        4 / h**2 * (
            numpy.sin(numpy.pi * i * h / 2) ** 2
            + numpy.sin(numpy.pi * j * h / 2) ** 2
        )
        for i, j in itertools.product(range(1, 8), repeat=2)
    )
    return numpy.asarray(vals[:count])


def test_eigsh_block_converges_degenerate_pair():
    """The square Laplacian's (i,j)/(j,i) eigenvalues are EXACTLY
    degenerate; single-vector Lanczos converges at most one member per
    cluster, block_size=2 must deliver both (VERDICT r2 item 6)."""
    nx = 24
    lap = ops.poisson_2d(nx)
    want = _laplacian_low_spectrum(nx, 4)
    r = F.eigsh(
        lap, k=4, n=nx * nx, which="sa", tol=1e-8, block_size=2,
        maxdim=24, max_restarts=300,
    )
    assert int(r.status) == 0
    got = numpy.sort(numpy.asarray(r.theta))
    assert numpy.allclose(got, want, rtol=1e-8), (got, want)
    # both members of the degenerate pair present
    assert abs(got[1] - got[2]) <= 1e-8 * abs(got[1])
    U = numpy.asarray(r.U)
    assert numpy.allclose(U.T @ U, numpy.eye(4), atol=1e-8)


@pytest.mark.parametrize("bsz", [2, 3])
def test_eigsh_block_matches_dense(bsz):
    rng = numpy.random.default_rng(7)
    d = numpy.r_[0.5, 0.5, 0.5, 1.0, numpy.linspace(2, 10, 116)]
    Q, _ = numpy.linalg.qr(rng.standard_normal((120, 120)))
    A = Q * d @ Q.T
    A = jnp.asarray(0.5 * (A + A.T))
    r = F.eigsh(A, k=4, which="sa", tol=1e-9, block_size=bsz, maxdim=24)
    assert int(r.status) == 0
    assert numpy.allclose(
        numpy.sort(numpy.asarray(r.theta)), d[:4], atol=1e-8
    )


def test_eigsh_block_shift_invert_degenerate():
    nx = 16
    lap = ops.poisson_2d(nx)
    want = _laplacian_low_spectrum(nx, 4)
    sigma = float(want[1]) * 0.9

    def inv(v):
        res = F.minres(
            lambda u: lap(u) - sigma * u, v, tol=1e-12, maxiter=2000
        )
        return res.x

    r = F.eigsh(
        lap, k=4, n=nx * nx, sigma=sigma, inv=inv, tol=1e-8,
        block_size=2, maxdim=24, max_restarts=100,
    )
    assert int(r.status) == 0
    got = numpy.sort(numpy.asarray(r.theta))
    assert numpy.allclose(got, want, rtol=1e-7), (got, want)


def test_eigsh_block_guards():
    A = jnp.eye(30)
    with pytest.raises(ValueError, match="block_size"):
        F.eigsh(A, k=2, block_size=0)
    with pytest.raises(ValueError, match="generalized"):
        F.eigsh(A, k=2, B=jnp.eye(30), Binv=jnp.eye(30), block_size=2)


def test_eigsh_block_sharded():
    """Block sweeps on the 8-device mesh: same result as single-device."""
    mesh = parallel.make_mesh()
    d = numpy.linspace(1.0, 400.0, 512)
    d[1] = d[0]  # planted degeneracy
    A = ops.diagonal(jnp.asarray(d))
    v0 = parallel.shard_vector(
        jnp.cos(jnp.arange(512) * 0.7391) + 0.01, mesh
    )

    with mesh:
        r = F.eigsh(A, k=3, v0=v0, which="sa", tol=1e-9, block_size=2,
                    maxdim=24)
    assert int(r.status) == 0
    assert numpy.allclose(
        numpy.sort(numpy.asarray(r.theta)), numpy.sort(d)[:3], rtol=1e-9
    )


def test_eigsh_one_reduce_matches_numpy_and_classic():
    """ortho='cgs2_1r' (one-reduce lagged DCGS-2 sweep, round 5): same
    eigenvalues as the dense oracle and the classic sweep; works with
    shift-invert composition."""
    rng = numpy.random.default_rng(0)
    n = 120
    B = rng.standard_normal((n, n))
    Am = (B + B.T) / 2
    ew = numpy.linalg.eigvalsh(Am)
    r = F.eigsh(jnp.asarray(Am), k=4, which="sa", tol=1e-10,
                ortho="cgs2_1r")
    assert int(r.status) == 0
    assert numpy.allclose(numpy.asarray(r.theta), ew[:4], atol=1e-8)

    # shift-invert: interior pairs nearest sigma, verified against A
    import jax.numpy as _jnp

    d = numpy.linspace(1.0, 60.0, 60)
    Ad = _jnp.asarray(numpy.diag(d))
    inv = lambda v: v / (_jnp.asarray(d) - 30.3)  # noqa: E731
    r = F.eigsh(Ad, k=3, sigma=30.3, inv=inv, tol=1e-10, maxdim=24,
                ortho="cgs2_1r")
    assert int(r.status) == 0
    want = d[numpy.argsort(numpy.abs(d - 30.3))[:3]]
    assert numpy.allclose(
        numpy.sort(numpy.asarray(r.theta)), numpy.sort(want), rtol=1e-9
    )


def test_eigsh_one_reduce_guards():
    import pytest

    d = jnp.arange(1.0, 41.0)
    Am = jnp.diag(d)
    with pytest.raises(ValueError, match="cgs2_1r"):
        F.eigsh(Am, k=2, block_size=2, ortho="cgs2_1r")
    with pytest.raises(ValueError, match="unknown eigsh ortho"):
        F.eigsh(Am, k=2, ortho="bogus")
    with pytest.raises(ValueError, match="cgs2_1r"):
        F.eigsh(Am, k=2, B=jnp.eye(40), Binv=jnp.eye(40),
                ortho="cgs2_1r")
