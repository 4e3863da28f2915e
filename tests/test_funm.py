"""Krylov matrix-function actions (functional.funm_krylov).

Oracles: dense scipy.linalg.expm and explicit eigendecompositions.
The reference has no matrix-function surface (linear systems only).
"""

import numpy
import scipy.linalg

import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def _sym(n=150, seed=0):
    rng = numpy.random.default_rng(seed)
    B = rng.standard_normal((n, n))
    return (B + B.T) / 2, rng.standard_normal(n)


def test_expm_multiply_matches_scipy():
    Am, b = _sym()
    for t in (0.5, -0.5):
        ref = scipy.linalg.expm(t * Am) @ b
        r = F.expm_multiply(jnp.asarray(Am), jnp.asarray(b), t,
                            maxdim=40)
        err = numpy.linalg.norm(numpy.asarray(r.x) - ref)
        assert err <= 1e-10 * numpy.linalg.norm(ref)
        # the correction tail is a valid (conservative) error signal
        assert float(r.corrections[r.m - 1]) < 1e-8


def test_funm_inverse_sqrt_spd():
    rng = numpy.random.default_rng(1)
    n = 150
    d = numpy.linspace(0.5, 10, n)
    Q, _ = numpy.linalg.qr(rng.standard_normal((n, n)))
    Aspd = Q @ numpy.diag(d) @ Q.T
    b = rng.standard_normal(n)
    ref = Q @ ((Q.T @ b) / numpy.sqrt(d))
    r = F.funm_krylov(
        jnp.asarray(Aspd), jnp.asarray(b), lambda w: 1 / jnp.sqrt(w),
        maxdim=40,
    )
    err = numpy.linalg.norm(numpy.asarray(r.x) - ref)
    assert err <= 1e-8 * numpy.linalg.norm(ref)


def test_expm_multiply_diffusion_semigroup():
    """exp(-dt*Lap) b stays positive, contracts, and matches the
    analytic heat-kernel decay of the lowest mode."""
    n = 128
    lap = ops.poisson_1d(n)
    h = 1.0 / (n + 1)
    xgrid = numpy.arange(1, n + 1) * h
    mode1 = numpy.sin(numpy.pi * xgrid)
    lam1 = (4.0 / h**2) * numpy.sin(numpy.pi * h / 2) ** 2
    dt = 1e-4
    r = F.expm_multiply(lap, jnp.asarray(mode1), -dt, maxdim=30)
    ref = numpy.exp(-dt * lam1) * mode1
    err = numpy.linalg.norm(numpy.asarray(r.x) - ref)
    assert err <= 1e-8 * numpy.linalg.norm(ref)


def test_funm_small_correction_under_exact_invariance():
    """b in a 3-dimensional invariant subspace: the approximation is
    exact at m >= 3 and the corrections vanish."""
    d = jnp.asarray(numpy.r_[1.0, 2.0, 3.0, numpy.full(50, 7.0)])
    A = ops.diagonal(d)
    b = jnp.zeros(53).at[0].set(1.0).at[1].set(2.0).at[2].set(-1.0)
    r = F.funm_krylov(A, b, jnp.exp, maxdim=10)
    ref = numpy.exp(numpy.asarray(d)) * numpy.asarray(b)
    assert numpy.allclose(numpy.asarray(r.x), ref, atol=1e-10)


def test_funm_jit_and_sharded():
    mesh = parallel.make_mesh(8)
    d = jnp.asarray(numpy.linspace(0.1, 2.0, 1024), jnp.float32)
    Aop = lambda v: d.astype(v.dtype) * v
    b = parallel.shard_vector(jnp.ones(1024, jnp.float32), mesh)
    with mesh:
        r = jax.jit(
            lambda bb: F.expm_multiply(Aop, bb, -1.0, maxdim=24)
        )(b)
    ref = numpy.exp(-numpy.asarray(d)) * 1.0
    assert numpy.allclose(numpy.asarray(r.x), ref, atol=1e-4)
    assert len({s.device for s in r.x.addressable_shards}) == 8


def test_funm_singular_f_with_early_invariance_no_nan():
    """f singular at 0 (1/sqrt) + Krylov invariance before maxdim: the
    dead block's exact-zero eigenvalues must be masked before f touches
    them (code-review finding: inf * 0 = NaN poisoned the output)."""
    d = numpy.repeat(numpy.array([1.0, 4.0, 9.0]), 20)
    A = ops.diagonal(jnp.asarray(d))
    b = jnp.ones(60)
    r = F.funm_krylov(A, b, lambda w: 1 / jnp.sqrt(w), maxdim=12)
    assert bool(jnp.all(jnp.isfinite(r.x)))
    ref = numpy.asarray(b) / numpy.sqrt(d)
    assert numpy.allclose(numpy.asarray(r.x), ref, atol=1e-10)


def test_inv_sqrt_multiply_matches_exact():
    """A^{-1/2} b by elliptic quadrature over multi-shift CG, kappa=1e4:
    explicit bounds reach ~1e-11; estimated bounds (with the 100x lmin
    slack) still reach ~1e-9."""
    n = 2000
    d = numpy.linspace(1.0, 1e4, n)
    A = ops.diagonal(jnp.asarray(d))
    b = jnp.asarray(numpy.random.default_rng(0).standard_normal(n))
    ref = numpy.asarray(b) / numpy.sqrt(d)

    x, info = F.inv_sqrt_multiply(
        A, b, lmin=1.0, lmax=1e4, terms=16, tol=1e-10, maxiter=2000
    )
    err = numpy.linalg.norm(numpy.asarray(x) - ref)
    assert err <= 1e-9 * numpy.linalg.norm(ref)
    assert bool(jnp.all(info["shift_status"] == F.CONVERGED))

    x2, _ = F.inv_sqrt_multiply(A, b, terms=20, tol=1e-9, maxiter=3000)
    err2 = numpy.linalg.norm(numpy.asarray(x2) - ref)
    assert err2 <= 1e-7 * numpy.linalg.norm(ref)


def test_inv_sqrt_multiply_squares_back():
    """Applying the quadrature twice gives A^{-1} b (self-consistency
    without an eigendecomposition oracle)."""
    nx = 20
    lap = ops.poisson_2d(nx)
    b = jnp.ones(nx * nx)
    h2lmin = 2 * (numpy.pi / (nx + 1)) ** 2 * (nx + 1) ** 2 * 0.5
    x1, _ = F.inv_sqrt_multiply(
        lap, b, lmin=h2lmin * 0.5, lmax=8.0 * (nx + 1) ** 2,
        terms=20, tol=1e-10, maxiter=4000,
    )
    x2, _ = F.inv_sqrt_multiply(
        lap, x1, lmin=h2lmin * 0.5, lmax=8.0 * (nx + 1) ** 2,
        terms=20, tol=1e-10, maxiter=4000,
    )
    rel = float(jnp.linalg.norm(b - lap(x2)) / jnp.linalg.norm(b))
    assert rel <= 1e-7


def test_inv_sqrt_multiply_guards():
    import pytest

    with pytest.raises(ValueError, match="lmin"):
        F.inv_sqrt_multiply(
            ops.diagonal(jnp.ones(8)), jnp.ones(8), lmin=-1.0, lmax=1.0
        )


def test_slq_logdet_diagonal_zero_variance():
    """Rademacher probes on a DIAGONAL operator have zero Hutchinson
    variance (z_i^2 = 1), so the estimate equals the exact logdet up to
    pure Lanczos-quadrature error."""
    n = 400
    d = numpy.linspace(0.5, 20.0, n)
    A = ops.diagonal(jnp.asarray(d))
    est, se = F.slq_logdet(A, jax.random.PRNGKey(0), n_probes=8,
                           maxdim=30)
    exact = numpy.sum(numpy.log(d))
    assert abs(float(est) - exact) <= 1e-5 * abs(exact)
    assert float(se) <= 1e-8 * abs(exact)


def test_slq_logdet_dense_within_error_bars():
    rng = numpy.random.default_rng(0)
    n = 200
    Q, _ = numpy.linalg.qr(rng.standard_normal((n, n)))
    d = numpy.linspace(1.0, 30.0, n)
    Am = Q @ numpy.diag(d) @ Q.T
    exact = numpy.linalg.slogdet(Am)[1]
    est, se = F.slq_logdet(jnp.asarray(Am), jax.random.PRNGKey(2),
                           n_probes=48, maxdim=30)
    # statistical agreement: within 4 standard errors
    assert abs(float(est) - exact) <= 4.0 * float(se) + 1e-6 * abs(exact)


def test_slq_trace_inverse_and_reproducibility():
    n = 300
    d = numpy.linspace(1.0, 50.0, n)
    A = ops.diagonal(jnp.asarray(d))
    key = jax.random.PRNGKey(7)
    e1, s1 = F.slq_trace(A, lambda w: 1.0 / w, key, n_probes=8,
                         maxdim=40)
    e2, s2 = F.slq_trace(A, lambda w: 1.0 / w, key, n_probes=8,
                         maxdim=40)
    assert float(e1) == float(e2)  # same key -> bitwise identical
    exact = numpy.sum(1.0 / d)
    assert abs(float(e1) - exact) <= 1e-4 * exact


def _nonsym(n=120, seed=5):
    rng = numpy.random.default_rng(seed)
    A = rng.standard_normal((n, n)) / numpy.sqrt(n) - 0.5 * numpy.eye(n)
    return A, rng.standard_normal(n)


def test_expm_multiply_arnoldi_matches_scipy():
    """Non-Hermitian expm against the dense Pade oracle."""
    A, b = _nonsym()
    oracle = scipy.linalg.expm(A) @ b
    r = F.expm_multiply(
        jnp.asarray(A), jnp.asarray(b), hermitian=False, maxdim=60
    )
    numpy.testing.assert_allclose(
        numpy.asarray(r.x), oracle,
        rtol=1e-10, atol=1e-12 * numpy.linalg.norm(oracle),
    )
    # converged a-posteriori signal: decayed correction tail
    tail = numpy.asarray(r.corrections)
    assert numpy.nanmax(tail) < 1e-10


def test_funm_arnoldi_polynomial_exactness():
    """f polynomial of degree < m is reproduced EXACTLY by the Krylov
    approximation -- the defining algebraic property, oracle-free."""
    A, b = _nonsym()
    r = F.funm_krylov_arnoldi(
        jnp.asarray(A), jnp.asarray(b), lambda w: w**3 + 2 * w, maxdim=10
    )
    direct = A @ A @ A @ b + 2 * (A @ b)
    numpy.testing.assert_allclose(
        numpy.asarray(r.x), direct, rtol=1e-12,
        atol=1e-12 * numpy.linalg.norm(direct),
    )


def test_funm_arnoldi_invariant_subspace_truncation():
    """A Krylov space that closes early (b in a small invariant
    subspace) truncates to the live block: the result is exact and f is
    never evaluated on the dead zero block (f(0) = inf here)."""
    d = numpy.r_[2.0, 3.0, numpy.linspace(4, 5, 38)]
    A = numpy.diag(d)
    A[0, 1] = 1.0  # couple components 0-1: a 2-dim invariant subspace
    b = numpy.zeros(40)
    b[0] = 1.0
    b[1] = 0.5
    r = F.funm_krylov_arnoldi(
        jnp.asarray(A), jnp.asarray(b), lambda w: 1.0 / w, maxdim=12
    )
    assert r.m == 2
    oracle = numpy.linalg.solve(A, b)
    numpy.testing.assert_allclose(numpy.asarray(r.x), oracle, atol=1e-12)


def test_funm_arnoldi_validates_f_xor_matfunc():
    A, b = _nonsym(20)
    try:
        F.funm_krylov_arnoldi(jnp.asarray(A), jnp.asarray(b))
    except ValueError as e:
        assert "exactly one" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")


def test_expm_arnoldi_sharded_matches_single_device():
    """The Arnoldi sweep shards over the mesh (host expm unchanged):
    convection-diffusion semigroup, sharded vs plain to fp."""
    cd = ops.convection_diffusion_2d(24, wind=(1.0, 0.5), eps=1.0)
    b = jnp.ones(24 * 24, jnp.float64)
    plain = F.expm_multiply(cd, b, t=-0.01, hermitian=False, maxdim=40)
    mesh = parallel.make_mesh(8)
    with mesh:
        bs = parallel.shard_vector(b, mesh)
        sharded = F.expm_multiply(cd, bs, t=-0.01, hermitian=False,
                                  maxdim=40)
    assert float(
        jnp.linalg.norm(sharded.x - plain.x) / jnp.linalg.norm(plain.x)
    ) < 1e-12
