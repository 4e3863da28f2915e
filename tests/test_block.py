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


# ---------------------------------------------------------------- block GMRES


def test_block_gmres_nonsymmetric_beats_single():
    """All columns solved; block Krylov converges in fewer (block) steps
    than single-rhs GMRES needs iterations."""
    rng = numpy.random.RandomState(0)
    A = numpy.diag(numpy.linspace(1, 10, 100)) + 0.1 * rng.randn(100, 100)
    B = rng.randn(100, 4)
    res = F.block_gmres(jnp.asarray(A), jnp.asarray(B), tol=1e-10,
                        maxiter=60)
    assert int(res.status) == 0
    X = numpy.asarray(res.x)
    rels = numpy.linalg.norm(B - A @ X, axis=0) / numpy.linalg.norm(
        B, axis=0
    )
    assert rels.max() <= 1e-10
    single = F.gmres(jnp.asarray(A), jnp.asarray(B[:, 0]), tol=1e-10,
                     maxiter=60)
    assert int(res.niter) < int(single.niter)


def test_block_gmres_complex():
    rng = numpy.random.RandomState(1)
    A = (numpy.diag(numpy.linspace(1, 8, 60))
         + 0.05 * (rng.randn(60, 60) + 1j * rng.randn(60, 60)))
    B = rng.randn(60, 3) + 1j * rng.randn(60, 3)
    res = F.block_gmres(jnp.asarray(A), jnp.asarray(B), tol=1e-10,
                        maxiter=60)
    assert int(res.status) == 0
    X = numpy.asarray(res.x)
    rels = numpy.linalg.norm(B - A @ X, axis=0) / numpy.linalg.norm(
        B, axis=0
    )
    assert rels.max() <= 1e-10


def test_block_gmres_rank_deficient_rhs():
    """Duplicated columns collapse to zero basis rows (rank guard); the
    masked least squares must keep every column converging."""
    rng = numpy.random.RandomState(2)
    nx = 32
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    B = numpy.stack(
        [numpy.ones(nx * nx), numpy.ones(nx * nx), rng.randn(nx * nx)],
        axis=1,
    )
    res = F.block_gmres(lap, jnp.asarray(B, jnp.float64), Ml=Mj,
                        tol=1e-9, maxiter=150)
    assert int(res.status) == 0
    X = numpy.asarray(res.x)
    for j in range(3):
        rel = float(
            jnp.linalg.norm(jnp.asarray(B[:, j]) - lap(res.x[:, j]))
            / numpy.linalg.norm(B[:, j])
        )
        assert rel <= 1e-8


def test_block_gmres_preconditioned_stencil():
    nx = 24
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    B = jnp.stack(
        [jnp.ones(nx * nx), jnp.linspace(0.0, 1.0, nx * nx)], axis=1
    ).astype(jnp.float64)
    res = F.block_gmres(lap, B, Ml=Mj, Mr=Mj, tol=1e-9, maxiter=200)
    assert int(res.status) == 0
    for j in range(2):
        rel = float(
            jnp.linalg.norm(B[:, j] - lap(res.x[:, j]))
            / jnp.linalg.norm(B[:, j])
        )
        assert rel <= 1e-8


def test_block_gmres_sharded():
    mesh = parallel.make_mesh(8)
    nx = 32
    lap = ops.poisson_2d(nx)
    B = jnp.stack([jnp.ones(nx * nx), jnp.linspace(0, 1, nx * nx)], 1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    Bsh = jax.device_put(B, NamedSharding(mesh, P("n", None)))
    with mesh:
        res = jax.jit(
            lambda bb: F.block_gmres(lap, bb, tol=1e-8, maxiter=200)
        )(Bsh)
    assert int(res.status) == 0
    assert len({s.device for s in res.x.addressable_shards}) == 8
