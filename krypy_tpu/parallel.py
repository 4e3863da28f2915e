"""Mesh and sharding utilities -- the distributed layer of krypy_tpu.

The reference is a single-address-space library (SURVEY.md section 2:
parallelism ABSENT); its scalability hook is the matrix-free operator
protocol.  Here, distribution is first-class and follows the GSPMD model:

* the long axis is the vector dimension N; vectors and the Krylov basis
  ``(m+1, N)`` are sharded over a 1-D device mesh along N;
* the small dense state (Hessenberg, Givens, projected rhs) is replicated;
* no explicit collectives are written: inner products are partial
  contractions + an XLA-inserted ``psum`` over ICI, and stencil operators
  get halo exchanges automatically;
* multi-host runs reuse the same program (jax.distributed + GSPMD).

Typical usage::

    mesh = make_mesh()                      # all local devices, axis "n"
    A = ops.poisson_2d(nx)                  # stencil matvec
    b = shard_vector(b, mesh)               # device_put with NamedSharding
    solve = jax.jit(lambda b: functional.cg(A, b, tol=1e-8, maxiter=500))
    result = solve(b)                       # partitioned automatically
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_vector",
    "replicate",
    "sharded_solve",
]


def make_mesh(n_devices=None, axis_name="n", devices=None):
    """Build a 1-D device mesh over the vector axis.

    :param n_devices: number of devices (default: all available).
    :param axis_name: mesh axis name (default ``"n"``).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_vector(x, mesh, axis_name=None):
    """Place a vector (or row-major basis block) with its last axis sharded
    over the mesh."""
    axis_name = mesh.axis_names[0] if axis_name is None else axis_name
    x = jnp.asarray(x)
    spec = P(*([None] * (x.ndim - 1) + [axis_name]))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh):
    """Replicate small state across the mesh."""
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


def sharded_solve(solver, A, b, mesh=None, **kwargs):
    """Run a functional solver with b (and all N-dim state) sharded over
    the mesh.  ``solver`` is one of :mod:`krypy_tpu.functional`'s cg /
    minres / gmres; static solver options go in ``kwargs``.

    Returns the :class:`~krypy_tpu.functional.common.SolveResult` with the
    solution sharded like b.
    """
    if mesh is None:
        mesh = make_mesh()
    b_sharded = shard_vector(b, mesh)

    @partial(jax.jit, static_argnames=())
    def _run(bb):
        return solver(A, bb, **kwargs)

    with mesh:
        return _run(b_sharded)
