#!/usr/bin/env python
"""GMRES per-iteration cost at 1M dof on the real TPU, per ortho mode.

Times a fixed-iteration GMRES run (tol=0 so every iteration executes) on
the 2-D convection-diffusion operator; reports wall/iter and the implied
orthogonalization bandwidth vs the HBM roofline.

Run:  python benchmarks/ortho_bench.py [maxiter [nx]]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    maxiter = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from krypy_tpu import functional as F, ops

    N = nx * nx
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    cd = ops.convection_diffusion_2d(nx, impl=impl)
    dtype = jnp.float32

    modes = ["cgs2", "bmgs2", "cgs2_pallas"]
    results = {}
    for ortho in modes:
        solve = jax.jit(
            lambda bb, o=ortho: F.gmres(
                cd, bb, tol=0.0, maxiter=maxiter, ortho=o
            )
        )
        # warm-up compile
        b = jnp.ones(N, dtype)
        r = solve(b)
        niter = int(r.niter)
        float(jnp.sum(r.x))

        walls = []
        for rep in range(4):
            bb = jnp.full(N, 1.0 + 0.001 * rep, dtype)  # vary input
            t0 = time.perf_counter()
            rr = solve(bb)
            float(jnp.sum(rr.x))  # scalar fetch = reliable barrier here
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        per_iter = wall / niter

        # ortho bytes (bmgs2): 2 passes x (coeff read + update read) of the
        # ACTIVE panel rows, avg (maxiter/2); cgs2: full maxiter+1 rows.
        bpe = np.dtype(np.float32).itemsize
        if ortho.startswith("bmgs"):
            rows_avg = (maxiter / 2 + 1)
        else:
            rows_avg = maxiter + 1
        ortho_bytes = 2 * 2 * rows_avg * N * bpe
        results[ortho] = {
            "wall_s": round(wall, 4),
            "niter": niter,
            "per_iter_us": round(per_iter * 1e6, 1),
            "ortho_GBps": round(ortho_bytes / per_iter / 1e9, 1),
        }
        print(json.dumps({"ortho": ortho, **results[ortho]}), flush=True)

    print(
        json.dumps(
            {
                "summary": f"gmres_{N}dof_m{maxiter}",
                "speedup_bmgs2_vs_cgs2": round(
                    results["cgs2"]["per_iter_us"]
                    / results["bmgs2"]["per_iter_us"],
                    2,
                ),
                "devices": str(jax.devices()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
