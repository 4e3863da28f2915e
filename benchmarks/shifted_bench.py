#!/usr/bin/env python
"""Multi-shift GMRES throughput: one basis vs per-shift solves.

1M-dof Poisson, ``n_shifts`` shifted systems (A + sigma_i I) x = b.
``shifted_gmres`` builds ONE m-step Krylov basis (m matvecs + the CGS2
sweeps) and finishes every shift with vmapped small solves plus one
basis GEMM; the sequential baseline runs one GMRES per shift -- m
matvecs and a full orthogonalization sweep EACH.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n_shifts = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    nx = int(sys.argv[3]) if len(sys.argv) > 3 else 1023

    from krypy_tpu import functional as F, ops

    N = nx * nx
    lap = ops.poisson_2d(nx)
    shifts = jnp.linspace(0.0, 100.0, n_shifts)

    multi = jax.jit(
        lambda b: F.shifted_gmres(lap, b, shifts, maxiter=m, tol=0.0)
    )
    single = jax.jit(
        lambda b, s: F.gmres(
            lambda v, s=s: lap(v) + s * v, b, tol=0.0, maxiter=m
        )
    )

    def sync(x):
        float(jnp.sum(jnp.abs(x)))

    b = jnp.ones(N, jnp.float32)
    sync(multi(b).X)
    sync(single(b, shifts[0]).x)

    walls_m, walls_s = [], []
    for rep in range(3):
        bb = jnp.full(N, 1.0 + 1e-3 * rep, jnp.float32)
        t0 = time.perf_counter()
        r = multi(bb)
        sync(r.X)
        walls_m.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        for i in range(n_shifts):
            rs = single(bb, shifts[i])
        sync(rs.x)
        walls_s.append(time.perf_counter() - t0)

    wm, ws = min(walls_m), min(walls_s)
    print(
        json.dumps(
            {
                "summary": f"shifted_{N}dof_{n_shifts}shifts_m{m}",
                "multi_shift_wall_s": round(wm, 4),
                "sequential_wall_s": round(ws, 4),
                "speedup": round(ws / wm, 2),
                "devices": str(jax.devices()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
