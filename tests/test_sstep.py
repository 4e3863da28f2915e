"""s-step (communication-avoiding) CG: correctness vs classic CG, the
true-residual guarantee, stagnation behavior, and sharded execution."""

import numpy
import pytest
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


@pytest.mark.parametrize("s", [2, 4, 8])
def test_ca_cg_matches_cg_jacobi_poisson(s):
    nx = 64
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    b = jnp.ones(nx * nx)
    ref = F.cg(lap, b, M=Mj, tol=1e-10, maxiter=500)
    res = F.ca_cg(lap, b, s=s, M=Mj, tol=1e-10, maxiter=500)
    assert int(res.status) == 0
    true_rel = float(
        jnp.linalg.norm(b - lap(res.x)) / jnp.linalg.norm(b)
    )
    assert true_rel <= 1e-9
    # s <= 4 tracks CG's iteration count exactly; s=8 pays a bounded
    # conditioning penalty for the monomial basis
    if s <= 4:
        assert int(res.niter) <= int(ref.niter) + s
    else:
        assert int(res.niter) <= 2 * int(ref.niter)


def test_ca_cg_multigrid():
    nx = 63
    lap = ops.poisson_2d(nx)
    Mg = ops.multigrid_poisson_preconditioner(nx, coarsest=7)
    b = jnp.ones(nx * nx)
    res = F.ca_cg(lap, b, s=4, M=Mg, tol=1e-10, maxiter=64)
    assert int(res.status) == 0
    assert int(res.niter) <= 12  # mesh-independent


def test_ca_cg_dense_spd_unpreconditioned():
    r = numpy.random.RandomState(0)
    Q, _ = numpy.linalg.qr(r.randn(80, 80))
    A = Q @ numpy.diag(numpy.linspace(1, 50, 80)) @ Q.T
    b = jnp.asarray(A @ r.randn(80))
    res = F.ca_cg(jnp.asarray(A), b, s=4, tol=1e-10, maxiter=400)
    assert int(res.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ res.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-9


def test_ca_cg_f32_floor_reports_maxiter():
    """A tolerance below the float32 floor must stagnate-stop with
    MAXITER, never report false convergence (true residual is tracked
    per block)."""
    nx = 64
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    b = jnp.ones(nx * nx, jnp.float32)
    res = F.ca_cg(lap, b, s=4, M=Mj, tol=1e-13, maxiter=3000)
    assert int(res.status) == 1
    # but it got to the f32 floor
    n = int(res.niter) // 4
    floor = numpy.nanmin(numpy.asarray(res.resnorms))
    assert floor < 1e-4


def test_ca_cg_sharded():
    mesh = parallel.make_mesh(8)
    nx = 64
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    b = parallel.shard_vector(jnp.ones(nx * nx), mesh)
    with mesh:
        res = jax.jit(
            lambda v: F.ca_cg(lap, v, s=4, M=Mj, tol=1e-10, maxiter=500)
        )(b)
    assert int(res.status) == 0
    assert len({s.device for s in res.x.addressable_shards}) == 8
