"""Block CG (multiple right-hand sides)."""

import numpy
import pytest
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def _dense_spd(n=80, seed=0):
    r = numpy.random.RandomState(seed)
    Q, _ = numpy.linalg.qr(r.randn(n, n))
    return Q @ numpy.diag(numpy.linspace(1, 100, n)) @ Q.T


def test_block_cg_accelerates_over_single():
    A = _dense_spd()
    r = numpy.random.RandomState(1)
    B = jnp.asarray(r.randn(80, 4))
    res = F.block_cg(jnp.asarray(A), B, tol=1e-10, maxiter=200)
    assert int(res.status) == 0
    rels = numpy.linalg.norm(
        numpy.asarray(B) - A @ numpy.asarray(res.x), axis=0
    ) / numpy.linalg.norm(numpy.asarray(B), axis=0)
    assert (rels <= 1e-9).all()
    worst_single = max(
        int(F.cg(jnp.asarray(A), B[:, j], tol=1e-10, maxiter=200).niter)
        for j in range(4)
    )
    # block Krylov shares spectral information across columns
    assert int(res.niter) < worst_single


def test_block_cg_rank_collapse_duplicate_columns():
    lap = ops.poisson_2d(24)
    Mj = ops.jacobi_preconditioner(lap)
    B = jnp.stack(
        [jnp.ones(576), jnp.ones(576), jnp.linspace(0, 1, 576)], axis=1
    )
    res = F.block_cg(lap, B, M=Mj, tol=1e-10, maxiter=400)
    assert int(res.status) == 0
    for j in range(3):
        rel = float(
            jnp.linalg.norm(B[:, j] - lap(res.x[:, j]))
            / jnp.linalg.norm(B[:, j])
        )
        assert rel <= 1e-9


def test_block_cg_shapes_and_errors():
    A = _dense_spd(20)
    with pytest.raises(ValueError):
        F.block_cg(jnp.asarray(A), jnp.ones(20))
    res = F.block_cg(jnp.asarray(A), jnp.ones((20, 2)), tol=1e-12)
    assert res.x.shape == (20, 2)
    assert res.resnorms.shape[1] == 2


def test_block_cg_sharded():
    mesh = parallel.make_mesh(8)
    nx = 32
    lap = ops.poisson_2d(nx)
    B = jnp.stack([jnp.ones(nx * nx), jnp.linspace(0, 1, nx * nx)], 1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    Bsh = jax.device_put(B, NamedSharding(mesh, P("n", None)))
    with mesh:
        res = jax.jit(
            lambda bb: F.block_cg(lap, bb, tol=1e-10, maxiter=600)
        )(Bsh)
    assert int(res.status) == 0
    assert len({s.device for s in res.x.addressable_shards}) == 8
