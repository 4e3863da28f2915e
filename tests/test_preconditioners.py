"""Preconditioner gallery tests: Jacobi, Chebyshev, geometric multigrid,
DST fast-Poisson solver."""

import numpy
import pytest
import jax.numpy as jnp

from krypy_tpu import functional as F, ops


def test_chebyshev_preconditioner_spd_and_effective():
    n = 64
    lap = ops.poisson_1d(n)
    h = 1.0 / (n + 1)
    lmin = float(4 * numpy.sin(numpy.pi * h / 2) ** 2 / h**2)
    lmax = float(4 * numpy.cos(numpy.pi * h / 2) ** 2 / h**2)
    M = ops.chebyshev_preconditioner(lap, degree=6, lmin=lmin, lmax=lmax)
    # SPD check via dense assembly
    dense = numpy.column_stack(
        [numpy.asarray(M(jnp.eye(n)[:, j])) for j in range(n)]
    )
    numpy.testing.assert_allclose(dense, dense.T, atol=1e-10)
    assert numpy.linalg.eigvalsh(dense).min() > 0
    # CG with Chebyshev needs substantially fewer iterations on a random
    # (non-smooth) right hand side
    rng = numpy.random.RandomState(3)
    b = jnp.asarray(rng.randn(n))
    plain = F.cg(lap, b, tol=1e-10, maxiter=300)
    cheb = F.cg(lap, b, M=M, tol=1e-10, maxiter=300)
    assert int(cheb.status) == F.CONVERGED
    assert int(cheb.niter) <= int(plain.niter) // 2


@pytest.mark.parametrize("nx", [31, 63, 127])
def test_multigrid_mesh_independent(nx):
    lap = ops.poisson_2d(nx)
    M = ops.multigrid_poisson_preconditioner(nx)
    res = F.cg(lap, jnp.ones(nx * nx), M=M, tol=1e-10, maxiter=30)
    assert int(res.status) == F.CONVERGED
    # mesh-independent iteration count
    assert int(res.niter) <= 10
    x = numpy.asarray(res.x)
    b = numpy.ones(nx * nx)
    rel = numpy.linalg.norm(
        b - numpy.asarray(lap(jnp.asarray(x)))
    ) / numpy.linalg.norm(b)
    assert rel <= 1e-9


def test_multigrid_requires_nested_grid():
    with pytest.raises(ValueError):
        ops.multigrid_poisson_preconditioner(100)


@pytest.mark.parametrize("nx,ny", [(31, 31), (15, 31), (63, 31)])
def test_dst_solver_exact(nx, ny):
    dst = ops.poisson_dst_solver(nx, ny)
    lap = ops.poisson_2d(nx, ny)
    rng = numpy.random.RandomState(0)
    b = jnp.asarray(rng.randn(nx * ny))
    x = dst(b)
    rel = float(jnp.linalg.norm(lap(x) - b) / jnp.linalg.norm(b))
    assert rel <= 1e-12


def test_multigrid_with_dst_coarse():
    nx = 63
    lap = ops.poisson_2d(nx)
    M = ops.multigrid_poisson_preconditioner(
        nx, coarsest=31, coarse_solver="dst"
    )
    res = F.cg(lap, jnp.ones(nx * nx), M=M, tol=1e-10, maxiter=20)
    assert int(res.status) == F.CONVERGED
    assert int(res.niter) <= 8
