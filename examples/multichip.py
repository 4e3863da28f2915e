"""Multi-chip solve over a device mesh.

Run with real chips, or emulate locally:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py

The solver code contains no collectives: sharding the operands over the
mesh makes GSPMD insert the all-reduces (inner products) and halo
exchanges (stencil) automatically."""

import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def main():
    mesh = parallel.make_mesh()
    n_dev = len(mesh.devices.ravel())
    print(f"mesh: {n_dev} devices, axis {mesh.axis_names}")

    nx = 32 * n_dev
    lap = ops.poisson_2d(nx, 64)
    N = nx * 64
    b = parallel.shard_vector(jnp.ones(N), mesh)

    res = parallel.sharded_solve(
        F.cg, lap, b, mesh=mesh,
        M=ops.jacobi_preconditioner(lap), tol=1e-8, maxiter=2000,
    )
    print(
        f"N={N}: {int(res.niter)} iterations, "
        f"status={int(res.status)}, "
        f"solution sharded over "
        f"{len({s.device for s in res.x.addressable_shards})} devices"
    )


if __name__ == "__main__":
    main()
