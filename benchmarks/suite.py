#!/usr/bin/env python
"""The five BASELINE.md benchmark configurations, end to end.

Run:  python benchmarks/suite.py [--size small|full]

Each config prints one JSON line; ``bench.py`` at the repo root remains
the single-line headline benchmark the driver consumes.

Configs (BASELINE.json):
  1. GMRES on the README diag system A=diag(1e-3, 2..100), b=ones(100).
  2. CG + MINRES on the 2-D Poisson 5-point Laplacian (SPD, Jacobi M,
     custom ip_B).
  3. Restarted GMRES with Ml preconditioning on nonsymmetric
     convection-diffusion.
  4. Deflated GMRES with Ritz vectors on a shifted Laplacian.
  5. Recycling GMRES over a sequence of NLS-type Jacobian solves.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    """Synchronize by fetching a scalar: block_until_ready is not a
    reliable barrier through remote-execution transports."""
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "sum")]
    for leaf in leaves[:1]:
        float(jnp.real(leaf.sum()))
    return out


def _timed(fn, *args, repeats=3):
    out = _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return out, best


def config1_readme_gmres():
    from krypy_tpu import functional as F, ops

    A = ops.readme_diag(100)
    b = jnp.ones(100)
    solve = jax.jit(lambda bb: F.gmres(A, bb, tol=1e-8, maxiter=100))
    res, wall = _timed(solve, b)
    return {
        "config": "1_readme_gmres",
        "niter": int(res.niter),
        "converged": bool(int(res.status) == 0),
        "wall_s": round(wall, 5),
    }


def config2_poisson_cg_minres(nx):
    """CG + MINRES on the weighted Poisson system to a float64 relative
    residual of 1e-8: float32 inner solves + mixed-precision refinement
    (BASELINE.md measures wall-time to 1e-8)."""
    from krypy_tpu import functional as F, ops

    lap = ops.poisson_2d(nx)
    N = nx * nx
    b = jnp.ones(N, jnp.float32)
    # custom ip_B: diagonal weight W; the operator W^{-1} Lap is
    # self-adjoint positive definite in the W-inner product.  The
    # preconditioner M ~ (W^{-1} L)^{-1} = L^{-1} W reuses the Poisson
    # multigrid V-cycle and is W-self-adjoint positive definite.
    w = jnp.linspace(1.0, 2.0, N).astype(jnp.float32)
    w64 = jnp.asarray(w, jnp.float64)
    A = lambda x: lap(x) / w.astype(x.dtype)
    A64 = lambda x: lap(x) / w64
    ip = lambda x, y: jnp.vdot(x, w.astype(x.dtype) * y)
    if (nx + 1) & nx == 0:
        mg = ops.multigrid_poisson_preconditioner(
            nx, coarsest=min(31, nx), coarse_sweeps=60
        )
        M = lambda r: mg(w * r)
    else:
        M = ops.jacobi_preconditioner(lap.diag.astype(jnp.float32) / w)

    out = {}
    for name, solver in (("cg", F.cg), ("minres", F.minres)):
        inner = jax.jit(
            lambda rr, s=solver: s(
                A, rr, M=M, ip=ip, tol=1e-4, maxiter=200,
                stagnation_window=20,
            )
        )
        # warm-up compile outside the timed refinement
        _sync(inner(b))
        res, info = F.refine_to(A64, b, inner, tol=1e-8, compiled=True)
        out[name] = {
            "rel": float(res.resnorms[int(res.niter)]),
            "converged": bool(res.converged),
            "cycles": info["cycles"],
            "inner_iters": info["inner_iters"],
            "wall_s": round(info["wall_s"], 4),
        }
    return {
        "config": f"2_poisson{N}_cg_minres_jacobi_weighted_ip_tol1e-8",
        **out,
    }


def config3_convdiff_restarted_gmres(nx):
    """Restarted GMRES with the FULL Ml/M/Mr preconditioner triple
    (BASELINE.md config 3) on nonsymmetric convection-diffusion, refined
    to a float64 relative residual of 1e-8.

    * ``Ml``: multigrid V-cycle of the diffusive part (the operator is
      Laplacian-dominated at this Peclet number);
    * ``M``: SPD diagonal inner-product-changing preconditioner;
    * ``Mr``: Jacobi right preconditioner.
    """
    from krypy_tpu import functional as F, ops
    from krypy_tpu.functional.gmres import restarted_gmres

    cd = ops.convection_diffusion_2d(nx)
    Ml = ops.multigrid_poisson_preconditioner(
        nx, coarsest=min(31, nx), coarse_sweeps=60
    )
    N = nx * nx
    h2 = (1.0 / (nx + 1)) ** 2
    M = ops.diagonal(jnp.full(N, 1.0 + 0.5 * h2, jnp.float32))
    Mr = ops.jacobi_preconditioner(jnp.full(N, 4.0 / h2, jnp.float32))
    b = jnp.ones(N, jnp.float32)

    restart_len = 30
    # compiled=True: the restart loop is itself traced, so it composes
    # with refine_to(compiled=True) into ONE whole-solve dispatch
    inner = lambda rr: restarted_gmres(
        cd, rr, Ml=Ml, M=M, Mr=Mr, tol=1e-4, maxiter=restart_len,
        max_restarts=10, compiled=True,
    )
    res, info = F.refine_to(cd, b, inner, tol=1e-8, compiled=True)
    return {
        "config": f"3_convdiff{N}_restarted_gmres_MlMMr_tol1e-8",
        "restart_len": restart_len,
        "rel": float(res.resnorms[int(res.niter)]),
        "converged": bool(res.converged),
        "cycles": info["cycles"],
        "inner_iters": info["inner_iters"],
        "wall_s": round(info["wall_s"], 4),
    }


def config4_shifted_laplacian_deflated(nx):
    from krypy_tpu import functional as F, ops

    N = nx * nx
    # mildly shifted Laplacian: a few low-lying outlier modes that Ritz
    # deflation removes
    sl = ops.shifted_laplacian_2d(nx, sigma=35.0)
    b = jnp.ones(N, jnp.float32)

    # first pass: plain GMRES collecting Ritz data
    res0, internals = F.gmres(
        sl, b, tol=1e-4, maxiter=250, return_internal=True
    )
    internals["niter"] = int(res0.niter)
    internals["E"] = jnp.zeros((0, 0))
    U = F.ritz_deflation_vectors(
        internals, n_vectors=6, which="sm", hermitian=True
    )

    inner = jax.jit(
        lambda rr: F.deflated_gmres(sl, rr, U, tol=1e-4, maxiter=250)
    )
    _sync(inner(b))  # warm-up compile
    res, info = F.refine_to(sl, b, inner, tol=1e-8, compiled=True)
    return {
        "config": f"4_shifted_laplacian{N}_deflated_gmres_tol1e-8",
        "plain_niter": int(res0.niter),
        "rel": float(res.resnorms[int(res.niter)]),
        "converged": bool(res.converged),
        "cycles": info["cycles"],
        "inner_iters": info["inner_iters"],
        "wall_s": round(info["wall_s"], 4),
    }


def config5_recycling_sequence(n, n_sys):
    from krypy_tpu import functional as F, ops

    # planted-outlier SPD sequence, slowly varying (the recycling regime);
    # outlier depth chosen within float32 attainable accuracy
    base = np.linspace(1, 2, n)
    base[:4] = [1e-4, 1e-3, 5e-3, 2e-2]
    rec = F.RecyclingGmres(n_vectors=3, which="sm", hermitian=True)
    b = jnp.ones(n, jnp.float32)
    # pre-compile the plain + deflated cores for the operator family
    # (serving warm-up; one compile per structure for the whole sequence)
    op0 = ops.diagonal(jnp.asarray(base, dtype=jnp.float32))
    t0 = time.perf_counter()
    rec.warmup(op0, b, tol=1e-4, maxiter=n)
    warmup_s = round(time.perf_counter() - t0, 4)
    iters, walls = [], []
    for i in range(n_sys):
        d = base * (1.0 + 0.01 * i)
        op = ops.diagonal(jnp.asarray(d, dtype=jnp.float32))
        t0 = time.perf_counter()
        r = rec.solve(op, b, tol=1e-4, maxiter=n)
        float(jnp.sum(r.x))
        walls.append(round(time.perf_counter() - t0, 4))
        iters.append(int(r.niter))
    return {
        "config": f"5_recycling_sequence_n{n}x{n_sys}",
        "warmup_s": warmup_s,
        "iters": iters,
        "walls_s": walls,
        "improved": bool(min(iters[1:]) < iters[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=("small", "full"), default="full")
    args = ap.parse_args()
    small = args.size == "small"

    nx2 = 127 if small else 1023
    nx3 = 63 if small else 255
    nx4 = 32 if small else 64
    n5 = 120 if small else 400

    for fn in (
        config1_readme_gmres,
        lambda: config2_poisson_cg_minres(nx2),
        lambda: config3_convdiff_restarted_gmres(nx3),
        lambda: config4_shifted_laplacian_deflated(nx4),
        lambda: config5_recycling_sequence(n5, 5),
    ):
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()
