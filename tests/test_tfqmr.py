"""TFQMR: transpose-free QMR (nonsymmetric short recurrence with
quasi-minimized, smoothed residuals).

Reference baseline: krypy has no nonsymmetric short-recurrence solver
(its option is full-memory GMRES, krypy/linsys.py:919-1004).
"""

import numpy

import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def test_tfqmr_dense_nonsymmetric():
    rng = numpy.random.RandomState(0)
    A = (numpy.diag(numpy.linspace(1, 20, 200))
         + 0.3 * numpy.triu(rng.randn(200, 200), 1) / numpy.sqrt(200))
    b = jnp.asarray(rng.randn(200))
    r = F.tfqmr(jnp.asarray(A), b, tol=1e-10, maxiter=400)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_tfqmr_preconditioned_convdiff():
    cd = ops.convection_diffusion_2d(48, 48)
    Mj = ops.jacobi_preconditioner(cd)
    b = jnp.ones(48 * 48, jnp.float64)
    r = F.tfqmr(cd, b, M=Mj, tol=1e-9, maxiter=3000)
    assert int(r.status) == 0
    rel = float(jnp.linalg.norm(b - cd(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-9


def test_tfqmr_complex():
    rng = numpy.random.RandomState(1)
    A = (numpy.diag(numpy.linspace(1, 8, 80))
         + 0.05 * (rng.randn(80, 80) + 1j * rng.randn(80, 80)))
    b = jnp.asarray(rng.randn(80) + 1j * rng.randn(80))
    r = F.tfqmr(jnp.asarray(A), b, tol=1e-10, maxiter=300)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_tfqmr_reported_convergence_is_explicit_verified():
    """CONVERGED implies the TRUE residual meets tol (the quasi-residual
    bound only arms an explicit check)."""
    rng = numpy.random.RandomState(2)
    A = (numpy.diag(numpy.linspace(1, 40, 150))
         + 0.2 * numpy.triu(rng.randn(150, 150), 1) / numpy.sqrt(150))
    b = jnp.asarray(rng.randn(150))
    r = F.tfqmr(jnp.asarray(A), b, tol=1e-8, maxiter=300)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-8


def test_tfqmr_f32_floor_honesty():
    cd = ops.convection_diffusion_2d(32, 32)
    b = jnp.ones(32 * 32, jnp.float32)
    r = F.tfqmr(cd, b, tol=1e-13, maxiter=4000)
    assert int(r.status) != 0
    assert bool(jnp.all(jnp.isfinite(r.x)))


def test_tfqmr_x0_and_zero_rhs():
    d = jnp.asarray(numpy.linspace(1.0, 5.0, 40))
    A = ops.diagonal(d)
    b = jnp.ones(40)
    x0 = b / d  # exact
    r = F.tfqmr(A, b, x0=x0, tol=1e-12)
    assert int(r.status) == 0
    assert int(r.niter) == 0
    rz = F.tfqmr(A, jnp.zeros(40), tol=1e-12)
    assert int(rz.status) == 0
    assert float(jnp.linalg.norm(rz.x)) == 0.0


def test_tfqmr_sharded():
    mesh = parallel.make_mesh(8)
    rng = numpy.random.RandomState(3)
    d = jnp.asarray(
        numpy.linspace(1.0, 30.0, 1024), jnp.float32
    )
    skew = jnp.asarray(rng.randn(1024) * 0.1, jnp.float32)
    # diag-dominant nonsymmetric stencil-free operator
    Aop = lambda v: d.astype(v.dtype) * v + skew.astype(v.dtype) * (
        jnp.roll(v, 1)
    )
    b = parallel.shard_vector(jnp.ones(1024, jnp.float32), mesh)
    with mesh:
        r = jax.jit(
            lambda v: F.tfqmr(Aop, v, tol=1e-5, maxiter=2000)
        )(b)
    assert int(r.status) == 0
    assert len({s.device for s in r.x.addressable_shards}) == 8
    rel = float(jnp.linalg.norm(b - Aop(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-5
