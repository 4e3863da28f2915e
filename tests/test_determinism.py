"""Determinism contract (SURVEY.md section 5.8): sharded reductions use a
fixed order, so repeated runs of the same compiled solve must be BITWISE
identical -- the property behind the reference's 14-decimal oracles.

Two distinct claims are tested:
1. run-to-run: the same jitted solve on the same sharded input twice
   gives bit-identical residual histories and solutions;
2. re-dispatch: a fresh jit of the same program (new compilation) is
   bitwise identical to the first.
"""

import numpy
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def _sharded_problem(mesh):
    nx, ny = 32, 32
    cd = ops.convection_diffusion_2d(nx, ny)
    b = parallel.shard_vector(jnp.ones(nx * ny, jnp.float64), mesh)
    return cd, b


def _solve_bits(solve, b):
    res = solve(b)
    n = int(res.niter)
    return (
        numpy.asarray(res.resnorms[: n + 1]).tobytes(),
        numpy.asarray(res.x).tobytes(),
        n,
    )


def test_sharded_solve_bitwise_reproducible():
    mesh = parallel.make_mesh(8)
    cd, b = _sharded_problem(mesh)

    def program(bb):
        return F.gmres(cd, bb, tol=1e-10, maxiter=80, ortho="cgs2")

    solve = jax.jit(program)
    with mesh:
        r1, x1, n1 = _solve_bits(solve, b)
        r2, x2, n2 = _solve_bits(solve, b)
        # a fresh compilation of the same program
        solve_again = jax.jit(lambda bb: program(bb))
        r3, x3, n3 = _solve_bits(solve_again, b)

    assert n1 == n2 == n3
    assert r1 == r2 == r3, "sharded resnorms are not bitwise reproducible"
    assert x1 == x2 == x3, "sharded solution is not bitwise reproducible"


def test_sharded_cg_bitwise_reproducible():
    mesh = parallel.make_mesh(8)
    nx = 32
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    b = parallel.shard_vector(jnp.ones(nx * nx, jnp.float64), mesh)
    solve = jax.jit(
        lambda bb: F.cg(lap, bb, M=Mj, tol=1e-12, maxiter=200)
    )
    with mesh:
        r1, x1, n1 = _solve_bits(solve, b)
        r2, x2, n2 = _solve_bits(solve, b)
    assert n1 == n2
    assert r1 == r2 and x1 == x2
