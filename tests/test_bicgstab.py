"""BiCGStab: nonsymmetric short-recurrence solver (constant memory where
GMRES stores an O(maxiter x N) basis)."""

import numpy
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def test_bicgstab_dense_nonsymmetric():
    rng = numpy.random.RandomState(0)
    A = (numpy.diag(numpy.linspace(1, 20, 200))
         + 0.3 * numpy.triu(rng.randn(200, 200), 1) / numpy.sqrt(200))
    b = jnp.asarray(rng.randn(200))
    r = F.bicgstab(jnp.asarray(A), b, tol=1e-10, maxiter=400)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_bicgstab_preconditioned_convdiff_beats_gmres_memory():
    """Converges on the BASELINE config-3 operator class with ~2 matvecs
    per iteration and 7 vectors of state; GMRES needs the full basis."""
    cd = ops.convection_diffusion_2d(48, 48)
    Mj = ops.jacobi_preconditioner(cd)
    b = jnp.ones(48 * 48, jnp.float64)
    r = F.bicgstab(cd, b, M=Mj, tol=1e-9, maxiter=3000)
    assert int(r.status) == 0
    rel = float(jnp.linalg.norm(b - cd(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-9


def test_bicgstab_complex():
    rng = numpy.random.RandomState(1)
    A = (numpy.diag(numpy.linspace(1, 8, 80))
         + 0.05 * (rng.randn(80, 80) + 1j * rng.randn(80, 80)))
    b = jnp.asarray(rng.randn(80) + 1j * rng.randn(80))
    r = F.bicgstab(jnp.asarray(A), b, tol=1e-10, maxiter=300)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_bicgstab_f32_floor_honesty():
    """Below-floor tolerance: stagnation guard reports MAXITER (or a
    detected breakdown), never false convergence; x stays finite."""
    cd = ops.convection_diffusion_2d(32, 32)
    b = jnp.ones(32 * 32, jnp.float32)
    r = F.bicgstab(cd, b, tol=1e-13, maxiter=4000, stagnation_window=50)
    assert int(r.status) != 0
    assert bool(jnp.all(jnp.isfinite(r.x)))
    assert numpy.nanmin(numpy.asarray(r.resnorms)) < 1e-2


def test_bicgstab_zero_rhs():
    r = F.bicgstab(jnp.eye(16), jnp.zeros(16), maxiter=8)
    assert int(r.status) == 0
    assert float(jnp.linalg.norm(r.x)) == 0.0


def test_bicgstab_explicit_residual_final_check():
    """The reported final residual must equal the true residual when the
    explicit policy triggers at convergence."""
    rng = numpy.random.RandomState(2)
    A = numpy.diag(numpy.linspace(1, 15, 120)) + 0.1 * rng.randn(120, 120)
    b = jnp.asarray(rng.randn(120))
    r = F.bicgstab(jnp.asarray(A), b, tol=1e-9, maxiter=400)
    assert int(r.status) == 0
    reported = float(r.resnorms[int(r.niter)])
    true = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert abs(reported - true) <= 1e-12 + 1e-6 * true


def test_bicgstab_sharded():
    mesh = parallel.make_mesh(8)
    cd = ops.convection_diffusion_2d(64, 64)
    Mj = ops.jacobi_preconditioner(cd)
    b = parallel.shard_vector(jnp.ones(64 * 64, jnp.float32), mesh)
    with mesh:
        res = jax.jit(
            lambda v: F.bicgstab(cd, v, M=Mj, tol=1e-3, maxiter=4000,
                                 stagnation_window=100)
        )(b)
    assert int(res.status) == 0
    assert len({s.device for s in res.x.addressable_shards}) == 8
