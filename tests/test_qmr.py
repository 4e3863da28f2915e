"""QMR (two-sided Lanczos, auto-derived transpose).

Oracles: explicit true residuals on dense/stencil operators (real,
complex, preconditioned, warm-started), `transpose_matvec` checked
against the dense transpose, explicit-AT path cross-checked against the
auto-derived path, and the honesty contract (zero rhs, unreachable
tolerance reports MAXITER)."""

import numpy
import pytest
import jax.numpy as jnp

from krypy_tpu import functional as F, ops


def _dense_nonsym(n, seed=0, spread=(1, 20), skew=0.3):
    rng = numpy.random.RandomState(seed)
    A = (numpy.diag(numpy.linspace(*spread, n))
         + skew * numpy.triu(rng.randn(n, n), 1) / numpy.sqrt(n))
    return A, rng


def test_transpose_matvec_matches_dense_transpose():
    rng = numpy.random.RandomState(0)
    A = rng.randn(40, 40) + 1j * rng.randn(40, 40)
    Aj = jnp.asarray(A)
    At = F.transpose_matvec(lambda x: Aj @ x, 40, Aj.dtype)
    x = jnp.asarray(rng.randn(40) + 1j * rng.randn(40))
    numpy.testing.assert_allclose(
        numpy.asarray(At(x)), A.T @ numpy.asarray(x), rtol=1e-12
    )


def test_qmr_dense_nonsymmetric():
    A, rng = _dense_nonsym(200)
    b = jnp.asarray(rng.randn(200))
    r = F.qmr(jnp.asarray(A), b, tol=1e-10, maxiter=500)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10
    assert numpy.isfinite(numpy.asarray(r.resnorms)[: int(r.niter) + 1]).all()


def test_qmr_matvec_only_operator_auto_transpose():
    """The convection-diffusion stencil is given only as a traced
    matvec; QMR derives A^T via jax.linear_transpose."""
    cd = ops.convection_diffusion_2d(32, 32)
    Mj = ops.jacobi_preconditioner(cd)
    b = jnp.ones(32 * 32, jnp.float64)
    r = F.qmr(cd, b, M=Mj, tol=1e-9, maxiter=2000)
    assert int(r.status) == 0
    rel = float(jnp.linalg.norm(b - cd(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-9


def test_qmr_explicit_AT_matches_auto():
    A, rng = _dense_nonsym(100, seed=3, spread=(1, 10), skew=0.2)
    b = jnp.asarray(rng.randn(100))
    Aj = jnp.asarray(A)
    r_auto = F.qmr(Aj, b, tol=1e-10, maxiter=300)
    r_expl = F.qmr(Aj, b, AT=jnp.asarray(A.T), tol=1e-10, maxiter=300)
    assert int(r_auto.status) == 0 and int(r_expl.status) == 0
    assert int(r_auto.niter) == int(r_expl.niter)
    numpy.testing.assert_allclose(
        numpy.asarray(r_auto.x), numpy.asarray(r_expl.x), rtol=1e-10
    )


def test_qmr_complex():
    rng = numpy.random.RandomState(1)
    n = 120
    A = (numpy.diag(numpy.linspace(1, 10, n)).astype(complex)
         + 0.2 * (rng.randn(n, n) + 1j * rng.randn(n, n)) / numpy.sqrt(n))
    b = jnp.asarray(rng.randn(n) + 1j * rng.randn(n))
    r = F.qmr(jnp.asarray(A), b, tol=1e-9, maxiter=400)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-9


def test_qmr_preconditioned_with_explicit_MT():
    A, rng = _dense_nonsym(80, seed=4, spread=(1, 50), skew=0.2)
    Dinv = 1.0 / numpy.diag(A)
    b = jnp.asarray(rng.randn(80))
    r = F.qmr(
        jnp.asarray(A), b,
        M=lambda x: jnp.asarray(Dinv) * x,
        MT=lambda x: jnp.asarray(Dinv) * x,
        tol=1e-10, maxiter=300,
    )
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_qmr_x0_and_zero_rhs():
    A, rng = _dense_nonsym(80, seed=5, spread=(1, 8), skew=0.2)
    b = jnp.asarray(rng.randn(80))
    x0 = jnp.asarray(rng.randn(80))
    r = F.qmr(jnp.asarray(A), b, x0=x0, tol=1e-10, maxiter=300)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10

    r0 = F.qmr(jnp.asarray(A), jnp.zeros(80), tol=1e-10)
    assert int(r0.status) == 0
    assert int(r0.niter) == 0
    assert float(jnp.linalg.norm(r0.x)) == 0.0


def test_qmr_maxiter_honest():
    A, rng = _dense_nonsym(150, seed=9, spread=(1, 3000), skew=0.5)
    b = jnp.asarray(rng.randn(150))
    r = F.qmr(jnp.asarray(A), b, tol=1e-14, maxiter=10)
    assert int(r.status) in (1, 2)
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel > 1e-14


def test_qmr_stagnation_window_f32():
    """At an f32 attainable floor the stagnation guard stops the solve
    instead of looping to maxiter."""
    A, rng = _dense_nonsym(100, seed=7, spread=(1, 100), skew=0.3)
    A32 = jnp.asarray(numpy.asarray(A, dtype=numpy.float32))
    b = jnp.asarray(rng.randn(100), jnp.float32)
    r = F.qmr(A32, b, tol=1e-14, maxiter=4000, stagnation_window=20)
    assert int(r.niter) < 4000


def test_qmr_one_reduce_parity_real_and_complex():
    """variant='1r' (one fused cross-Gram per iteration) reproduces the
    classic iteration to fp on real AND complex systems: the
    measured-anchor expansions (nu_v, nu_w, w^T v, <r,r> from the same
    Gram) keep the derived norms exact to the attainable floor."""
    import numpy

    rng = numpy.random.RandomState(0)
    n = 150
    A = numpy.diag(numpy.linspace(1, 40, n))
    A = A + 0.5 * rng.randn(n, n) / numpy.sqrt(n)
    b = rng.randn(n)
    rc = F.qmr(jnp.asarray(A), jnp.asarray(b), tol=1e-9, maxiter=300)
    r1 = F.qmr(jnp.asarray(A), jnp.asarray(b), tol=1e-9, maxiter=300,
               variant="1r")
    assert int(r1.status) == int(rc.status) == F.CONVERGED
    assert int(r1.niter) == int(rc.niter)
    rel = numpy.linalg.norm(
        b - A @ numpy.asarray(r1.x)
    ) / numpy.linalg.norm(b)
    assert rel <= 1e-9

    Ac = A + 1j * 0.1 * rng.randn(n, n) / numpy.sqrt(n)
    bc = b + 1j * rng.randn(n)
    rc2 = F.qmr(jnp.asarray(Ac), jnp.asarray(bc), tol=1e-8, maxiter=300)
    r12 = F.qmr(jnp.asarray(Ac), jnp.asarray(bc), tol=1e-8, maxiter=300,
                variant="1r")
    assert int(r12.niter) == int(rc2.niter)
    relc = numpy.linalg.norm(
        bc - Ac @ numpy.asarray(r12.x)
    ) / numpy.linalg.norm(bc)
    assert relc <= 5e-8

    with pytest.raises(ValueError):
        F.qmr(jnp.asarray(A), jnp.asarray(b), variant="bogus")
