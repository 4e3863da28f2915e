#!/usr/bin/env python
"""Per-iteration cost: classic CG vs s-step CG at 1M dof on the real TPU
(VERDICT r1 item 9: communication-avoiding variant bench line).

Both run a fixed iteration budget (tol=0) on the Jacobi-preconditioned
1M-dof Poisson system, so the wall ratio is the per-iteration speedup of
the fused-reduction formulation.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from krypy_tpu import functional as F, ops

    N = nx * nx
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    lap = ops.poisson_2d(nx, impl=impl)
    Mj = ops.jacobi_preconditioner(lap)

    def timed(solve, label):
        b = jnp.ones(N, jnp.float32)
        r = solve(b)
        niter = int(r.niter)
        float(jnp.sum(r.x))
        walls = []
        for rep in range(4):
            bb = jnp.full(N, 1.0 + 1e-3 * rep, jnp.float32)
            t0 = time.perf_counter()
            rr = solve(bb)
            float(jnp.sum(rr.x))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        out = {
            "solver": label,
            "niter": niter,
            "wall_s": round(wall, 4),
            "per_iter_us": round(wall / max(niter, 1) * 1e6, 1),
        }
        print(json.dumps(out), flush=True)
        return out

    cg = timed(
        jax.jit(lambda b: F.cg(lap, b, M=Mj, tol=0.0, maxiter=iters,
                               stagnation_window=10**9)),
        "cg",
    )
    results = {"cg": cg}
    for s in (2, 4, 8):
        results[s] = timed(
            jax.jit(
                lambda b, s=s: F.ca_cg(
                    lap, b, s=s, M=Mj, tol=0.0, maxiter=iters,
                    stagnation_window=10**9,
                )
            ),
            f"ca_cg_s{s}",
        )
    print(
        json.dumps(
            {
                "summary": f"cg_vs_ca_cg_{N}dof_{iters}iters",
                "speedup_s4_vs_cg": round(
                    cg["per_iter_us"] / results[4]["per_iter_us"], 2
                ),
                "devices": str(jax.devices()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
