"""Flexible GMRES: fixed-M equivalence with GMRES, inner-outer Krylov
preconditioning, iteration-varying preconditioners, sharded execution."""

import numpy
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def test_fgmres_fixed_M_matches_right_preconditioned_gmres():
    """With a FIXED linear M, FGMRES produces the same residual history
    as right-preconditioned GMRES (they build the same Krylov space)."""
    rng = numpy.random.RandomState(0)
    A = numpy.diag(numpy.linspace(1, 20, 80)) + 0.1 * rng.randn(80, 80)
    Minv = numpy.diag(1.0 / numpy.diag(A))
    b = jnp.asarray(rng.randn(80))
    ref = F.gmres(jnp.asarray(A), b, Mr=jnp.asarray(Minv), tol=1e-12,
                  maxiter=60)
    res = F.fgmres(jnp.asarray(A), b, M=jnp.asarray(Minv), tol=1e-12,
                   maxiter=60)
    assert int(res.status) == 0
    rg = numpy.asarray(ref.resnorms)[: int(ref.niter) + 1]
    rf = numpy.asarray(res.resnorms)[: int(res.niter) + 1]
    # Mr-preconditioned GMRES minimizes the same left residual norm
    assert numpy.allclose(rf[: len(rg)], rg[: len(rf)], rtol=1e-8)
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ res.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-11


def test_fgmres_inner_cg_preconditioner():
    """The flexible point: an inner CG solve as the preconditioner.
    krypy cannot express this (Mr must be a fixed linear operator)."""
    nx = 48
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    b = jnp.ones(nx * nx, jnp.float64)

    def inner(v):
        # fixed-budget inner solve: stagnation_window must stay 0 so the
        # FINAL iterate is returned (the guard would return x0=0 when
        # the M-weighted residual of this rhs never improves)
        return F.cg(lap, v, M=Mj, tol=0.0, maxiter=10).x

    res = F.fgmres(lap, b, M=inner, tol=1e-10, maxiter=60)
    assert int(res.status) == 0
    rel = float(jnp.linalg.norm(b - lap(res.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-10
    # far fewer outer iterations than unpreconditioned GMRES needs
    plain = F.gmres(lap, b, tol=1e-10, maxiter=60)
    assert int(res.niter) < int(plain.niter) / 2 or int(plain.status) != 0


def test_fgmres_nonconstant_preconditioner_converges():
    """A deliberately iteration-dependent (nonlinear) M: FGMRES still
    converges because the solution lives in span(Z)."""
    rng = numpy.random.RandomState(1)
    A = numpy.diag(numpy.linspace(1, 20, 60)) + 0.05 * rng.randn(60, 60)
    b = jnp.asarray(rng.randn(60))
    diag = jnp.asarray(1.0 / numpy.diag(A))

    def wobbly(v):
        # scaling that depends on the INPUT VECTOR (nonlinear in v)
        jitter = 1.0 + 0.3 * jnp.tanh(jnp.sum(v))
        return diag.astype(v.dtype) * v * jitter

    res = F.fgmres(jnp.asarray(A), b, M=wobbly, tol=1e-11, maxiter=60)
    assert int(res.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ res.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_fgmres_bmgs2_and_zero_rhs():
    res = F.fgmres(jnp.eye(16), jnp.zeros(16), maxiter=8)
    assert int(res.status) == 0
    assert float(jnp.linalg.norm(res.x)) == 0.0
    rng = numpy.random.RandomState(2)
    A = numpy.diag(numpy.linspace(1, 10, 50)) + 0.05 * rng.randn(50, 50)
    b = jnp.asarray(rng.randn(50))
    res = F.fgmres(jnp.asarray(A), b, tol=1e-11, maxiter=50,
                   ortho="bmgs2")
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ res.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_fgmres_sharded_inner_chebyshev():
    """Inner-outer on a mesh: Chebyshev (reduction-free) inner sweeps
    inside a sharded FGMRES."""
    mesh = parallel.make_mesh(8)
    nx = 64
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    h = 1.0 / (nx + 1)
    lmin = float(2 * numpy.sin(numpy.pi * h / 2) ** 2)
    lmax = float(2 * numpy.cos(numpy.pi * h / 2) ** 2)

    def inner(v):
        return F.chebyshev(
            lap, v, M=Mj, lmin=lmin, lmax=lmax, tol=0.0, maxiter=32,
            check_every=32, stagnation_window=10**9,
        ).x

    b = parallel.shard_vector(jnp.ones(nx * nx, jnp.float32), mesh)
    with mesh:
        res = jax.jit(
            lambda v: F.fgmres(lap, v, M=inner, tol=1e-4, maxiter=30)
        )(b)
    assert int(res.status) == 0
    assert len({s.device for s in res.x.addressable_shards}) == 8
