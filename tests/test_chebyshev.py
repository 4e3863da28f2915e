"""Chebyshev iteration: convergence with estimated bounds, honesty with
wrong bounds, preconditioning, and sharded execution."""

import numpy
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def _diag_system(N=2048, lo=1.0, hi=50.0, seed=0):
    rng = numpy.random.default_rng(seed)
    d = numpy.linspace(lo, hi, N)
    D = jnp.asarray(d, jnp.float64)
    A = lambda v: D.astype(v.dtype) * v  # noqa: E731
    b = jnp.asarray(rng.standard_normal(N))
    return d, A, b


def test_chebyshev_converges_with_estimated_bounds():
    d, A, b = _diag_system()
    lmin, lmax = F.spectral_bounds(A, b, steps=24)
    assert 0 < lmin <= 1.0 and 50.0 <= lmax < 60.0
    r = F.chebyshev(A, b, lmin=lmin, lmax=lmax, tol=1e-10, maxiter=400)
    assert int(r.status) == 0
    rel = float(jnp.linalg.norm(b - A(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-10
    # known rate: within ~2x of CG's iteration count on this spectrum
    rc = F.cg(A, b, tol=1e-10, maxiter=400)
    assert int(r.niter) <= 2 * int(rc.niter)


def test_chebyshev_wrong_bounds_reports_honestly():
    _, A, b = _diag_system()
    r = F.chebyshev(A, b, lmin=5.0, lmax=20.0, tol=1e-10, maxiter=400)
    assert int(r.status) != 0  # spectrum leaks outside the interval


def test_chebyshev_multigrid_preconditioned():
    nx = 63
    lap = ops.poisson_2d(nx)
    Mg = ops.multigrid_poisson_preconditioner(nx, coarsest=7)
    b = jnp.ones(nx * nx, jnp.float64)
    lmin, lmax = F.spectral_bounds(lap, b, M=Mg, steps=24)
    r = F.chebyshev(lap, b, M=Mg, lmin=lmin, lmax=lmax, tol=1e-10,
                    maxiter=200, check_every=8)
    assert int(r.status) == 0
    assert int(r.niter) <= 40
    rel = float(jnp.linalg.norm(b - lap(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-10


def test_chebyshev_sharded():
    mesh = parallel.make_mesh(8)
    nx = 64
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    b = parallel.shard_vector(jnp.ones(nx * nx, jnp.float32), mesh)
    # Jacobi on constant-diagonal Poisson is a scaling: the spectrum of
    # MA is [2 sin^2(pi h/2), 2 cos^2(pi h/2)], h = 1/(nx+1)
    h = 1.0 / (nx + 1)
    lmin = float(2 * numpy.sin(numpy.pi * h / 2) ** 2)
    lmax = float(2 * numpy.cos(numpy.pi * h / 2) ** 2)
    with mesh:
        res = jax.jit(
            lambda v: F.chebyshev(
                lap, v, M=Mj, lmin=lmin, lmax=lmax, tol=1e-3,
                maxiter=6000, check_every=64,
            )
        )(b)
    assert int(res.status) == 0
    assert len({s.device for s in res.x.addressable_shards}) == 8
