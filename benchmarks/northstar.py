#!/usr/bin/env python
"""North-star benchmark (BASELINE.json:5): deflated restarted GMRES on a
>=10M-dof sparse operator to 1e-8 TRUE (float64) relative residual,
krypy_tpu on TPU vs SciPy on CPU.

Problem: 2-D convection-diffusion (nonsymmetric, upwind) on a 4095^2 grid
(N = 16,769,025 ~ 16.8M dof; override with NORTHSTAR_NX).

Both sides run the SAME algorithm so the comparison is hardware+framework,
not algorithm-vs-algorithm: restarted GMRES, left-preconditioned with a
geometric multigrid V-cycle of the diffusive part, deflated with Ritz
vectors harvested from the first cycle (TPU side; scipy.sparse.linalg.gmres
has no deflation hook -- it gets the same multigrid and restart length).
The TPU side runs float32 inner cycles + float64 iterative refinement;
SciPy runs float64 end to end.  Both must reach ||b - A x|| / ||b|| <= 1e-8
in float64 -- measured, not extrapolated.

Prints one JSON line per side plus a summary line.
"""

import json
import os
import time

os.environ.setdefault("KRYPY_TPU_X64", "1")

import numpy as np

import jax
import jax.numpy as jnp

TOL = 1e-8
# restart length: 25 fits 16.8M dof comfortably; at 67M dof (8191^2,
# NORTHSTAR_NX=8191) the 26-row f32 basis alone is 7.0 GB, so the probe
# overrides this down to fit the 16 GB v5e HBM
RESTART = int(os.environ.get("NORTHSTAR_RESTART", "25"))
# orthogonalization scheme of the inner GMRES cycles (round 5: the
# one-reduce scheme composes with the bf16 basis, so the memory lever
# and the latency lever stack at the 67M-dof scale -- VERDICT r4 #2)
ORTHO = os.environ.get("NORTHSTAR_ORTHO", "cgs2")
# basis storage dtype: "bf16" halves the dominant HBM traffic AND the
# basis memory (doubling the affordable restart length at 67M dof).
# MEASURED CONSTRAINT (round 5): a quantized basis requires RIGHT
# preconditioning here -- basis quantization noise is high-frequency,
# the raw operator amplifies it by lambda_max while the solution lives
# at lambda_min, so with LEFT preconditioning the true-residual floor
# is eps(bf16)*kappa(A) (~1e5 at 8191^2: the solve diverges, measured
# rel 4.7-20 at 255^2); with x = Mr(V y) the multigrid filters the
# rough noise and the floor drops to eps(bf16)*kappa(A Mr) ~ 1e-2 per
# cycle (measured), which refine_to absorbs.
BASIS = os.environ.get("NORTHSTAR_BASIS", "f32")
# preconditioner side: "left" (default; deflation-exact) or "right"
PRECOND = os.environ.get("NORTHSTAR_PRECOND", "left")
# lane-padded grid layout (round 5): embed the 8191^2 grid in
# (8191, 8192) with a zero pad column (== the Dirichlet ghost), which
# lane-aligns every row -- the f32 operator and the multigrid smoother/
# residual then run as fused Pallas affine-stencil kernels at the HBM
# roofline instead of the lane-misaligned jnp chains (measured 39 GB/s,
# benchmarks/RESULTS_r5.md), and the padded N is 128-divisible, which
# unlocks the fused Pallas orthogonalization kernels.  The f64
# refinement stays unpadded (no Mosaic f64).
PAD = os.environ.get("NORTHSTAR_PAD", "0") == "1"
# deflation width (default 0): MEASURED FINDING -- the multigrid
# preconditioner clusters the spectrum so Ritz deflation has nothing to
# remove, and at >=10M dof the float32 residual noise feeds through the
# deflation correction and destroys iterates.  Deflated refinement works
# at smaller scales (NORTHSTAR_DEFL=6 converges at 255^2 with ~25%
# overhead); the deflated solvers are exercised for real in
# benchmarks/suite.py configs 4-5 where deflation genuinely pays.
N_DEFL = int(os.environ.get("NORTHSTAR_DEFL", "0"))
# one float32 inner cycle stalls near its kappa-limited true-residual
# floor; chasing tighter tolerances burns iterations without improving
# the refinement rate (each refinement cycle restarts the correction
# problem at relative residual 1)
INNER_TOL = 1e-3
WIND = (1.0, 0.5)
EPS = 1.0


# ---------------------------------------------------------------- TPU side
def tpu_side(nx):
    from krypy_tpu import functional as F, ops

    N = nx * nx
    h = 1.0 / (nx + 1)
    h2 = h * h
    # float32 inner system is h^2-EQUILIBRATED: the raw stencil's 1/h^2
    # coefficients (~1.7e7 at this mesh) amplify float32 rounding into a
    # ~1e-2 true-residual floor; with O(1) coefficients each refinement
    # cycle gains ~4 orders instead of ~2 (measured).  The scaled
    # operator is built from scaled coefficients -- scaling the OUTPUT
    # would round first and scale the damage.
    cd32 = ops.convection_diffusion_2d(
        nx, wind=(WIND[0] * h2, WIND[1] * h2), eps=EPS * h2,
        pad_cols=PAD, impl="pallas" if PAD else "jnp",
    )
    cd64 = ops.convection_diffusion_2d(nx, wind=WIND, eps=EPS)
    # multigrid of the (unscaled-spectrum) diffusive part as the LEFT
    # preconditioner (deflation's oblique correction is exact for left
    # deflation only); restart control below uses explicit float32 true
    # residuals, so the left-preconditioned monitored norm cannot
    # overstate progress.  NOTE: the Pallas stencil is NOT used here --
    # multigrid grids are 2^k-1, always lane-unaligned, where the jnp
    # lowering measured 4.5x faster (docs/DESIGN.md section 8).
    # the 1/h2 equilibration scale rides the preconditioner itself:
    # on the padded Pallas lane it folds into the final post-smoothing
    # kernel (zero extra HBM passes -- the external `* (1/h2)` wrapper
    # used before cost a full 268 MB read+write per application at 67M)
    Ml = ops.multigrid_poisson_preconditioner(
        nx, coarsest=31, coarse_sweeps=60,
        pad_cols=PAD, impl="pallas" if PAD else "jnp",
        scale=1.0 / h2,
    )
    b = jnp.ones(N, jnp.float32)

    h2_f32 = jnp.float32(h2)

    if N_DEFL == 0:
        # default path: fully-compiled solve (see below); no Ritz
        # harvest needed
        return _tpu_compiled(nx, N, cd32, cd64, Ml, b, h2_f32)
    if PAD:
        raise SystemExit("NORTHSTAR_PAD composes with the compiled "
                         "(NORTHSTAR_DEFL=0) path only")

    # cycle 1: plain GMRES stopping at the inner tolerance, so the Ritz
    # harvest uses only the CLEAN leading Krylov directions (running to
    # the float32 stall fills the basis with noise vectors whose "Ritz
    # vectors" destroy later iterates through the deflation correction
    # -- measured at 4095^2)
    first = jax.jit(
        lambda rr: F.gmres(
            cd32, rr, Ml=Ml, tol=INNER_TOL, maxiter=RESTART,
            return_internal=True,
        )
    )
    res0, internals = first(b * h2_f32)
    internals = dict(internals)
    internals["niter"] = int(res0.niter)
    internals["E"] = jnp.zeros((0, 0))
    d_eff = min(N_DEFL, max(int(res0.niter) - 1, 0))
    U = F.ritz_deflation_vectors(
        internals, n_vectors=d_eff, which="sm", hermitian=False
    )

    # U must be a traced argument: closing over it would bake an
    # N x d constant into the uploaded HLO (hundreds of MB at 16.8M dof)
    if d_eff > 0:
        cycle = jax.jit(
            lambda rr, x0, UU: F.deflated_gmres(
                cd32, rr, UU, Ml=Ml, x0=x0, tol=INNER_TOL,
                maxiter=RESTART,
            )
        )
    else:
        _plain = jax.jit(
            lambda rr, x0: F.gmres(
                cd32, rr, Ml=Ml, x0=x0, tol=INNER_TOL, maxiter=RESTART
            )
        )
        cycle = lambda rr, x0, UU: _plain(rr, x0)

    matvecs = {"n": 0}

    def inner_solve(r32, max_restarts=3):
        """Deflated restarted GMRES (on the equilibrated system) at the
        float32 floor.  Each restart recomputes the float32 residual, so
        restarts themselves act as float32-level refinement; the best
        iterate (by TRUE f32 residual) wins."""
        rs = r32 * h2_f32
        rs_norm = float(jnp.linalg.norm(rs))
        x = jnp.zeros_like(r32)
        best_x, best = x, float("inf")
        res = None
        for _ in range(max_restarts):
            res = cycle(rs, x, U)
            x = res.x
            matvecs["n"] += int(res.niter) + 1 + d_eff
            rel = float(jnp.linalg.norm(rs - cd32(x))) / rs_norm
            matvecs["n"] += 1
            if rel < best:
                best_x, best = x, rel
            else:
                break
            if int(res.status) in (0, 2):
                break
        return res._replace(x=best_x)

    # warm-up compiles (production = compile once, solve many)
    w = inner_solve(b, max_restarts=1)
    float(jnp.sum(w.x))
    matvecs["n"] = 0

    result, info = F.refine_to(cd64, b, inner_solve, tol=TOL)
    rel = float(jnp.nanmin(result.resnorms))
    return {
        "side": "tpu",
        "N": N,
        "wall_s": round(info["wall_s"], 3),
        "rel_res64": rel,
        "converged": bool(result.converged),
        "matvecs": matvecs["n"],
        "n_deflation": d_eff,
        "refine_cycles": info["cycles"],
        "device": str(jax.devices()[0]),
    }


def _tpu_compiled(nx, N, cd32, cd64, Ml, b, h2_f32):
    """Default (undeflated) path: the inner restarted-GMRES driver is
    itself a traced while_loop, and refine_to(compiled=True) runs the
    ENTIRE solve -- f32 restarted GMRES cycles, f32 true-residual
    restart control, f64 refinement -- as ONE compiled program: a single
    device dispatch instead of ~2 transport round trips (~26 ms each)
    per restart and per refinement cycle."""
    from jax import lax

    from krypy_tpu import functional as F, ops
    from krypy_tpu.functional.common import MAXITER, SolveResult

    def inner_solve(r32):
        """Traced analog of the host restart loop: up to 3 GMRES(m)
        cycles on the equilibrated system, best iterate by TRUE f32
        residual, early stop on non-improvement/convergence.  With
        NORTHSTAR_PAD the cycles run entirely in the lane-padded layout
        (pad/unpad at this boundary only; the f64 outer loop is
        unpadded)."""
        rs = r32 * h2_f32
        if PAD:
            rs = ops.pad_grid_vec(rs, nx, nx)
        rs_norm = jnp.maximum(jnp.linalg.norm(rs), 1e-30)
        xz = jnp.zeros_like(rs)

        def cond(c):
            i, x, bx, best, done, nit = c
            return (i < 3) & ~done

        def body(c):
            i, x, bx, best, done, nit = c
            pk = {"Mr": Ml} if PRECOND == "right" else {"Ml": Ml}
            res = F.gmres(
                cd32, rs, x0=x, tol=INNER_TOL, maxiter=RESTART,
                ortho=ORTHO,
                basis_dtype=jnp.bfloat16 if BASIS == "bf16" else None,
                **pk,
            )
            rel = jnp.linalg.norm(rs - cd32(res.x)) / rs_norm
            better = rel < best
            return (
                i + 1,
                res.x,
                jnp.where(better, res.x, bx),
                jnp.minimum(best, rel),
                (~better) | (res.status == 0) | (res.status == 2),
                nit + res.niter + 2,
            )

        _, _, bx, _, _, nit = lax.while_loop(
            cond, body,
            (
                jnp.asarray(0), xz, xz,
                jnp.asarray(jnp.inf, jnp.float32),
                jnp.asarray(False), jnp.asarray(0),
            ),
        )
        if PAD:
            bx = ops.unpad_grid_vec(bx, nx, nx)
        return SolveResult(
            x=bx, resnorms=jnp.zeros(1), niter=nit,
            status=jnp.asarray(MAXITER),
        )

    result, info = F.refine_to(
        cd64, b, inner_solve, tol=TOL, compiled=True
    )
    rel = float(jnp.nanmin(result.resnorms))
    return {
        "side": "tpu",
        "N": N,
        "wall_s": round(info["wall_s"], 3),
        "rel_res64": rel,
        "converged": bool(result.converged),
        "matvecs": int(info["inner_iters"]) + info["cycles"] + 1,
        "n_deflation": 0,
        "refine_cycles": info["cycles"],
        "compiled": True,
        "restart": RESTART,
        "ortho": ORTHO,
        "basis": BASIS,
        "precond": PRECOND,
        "pad": PAD,
        "device": str(jax.devices()[0]),
    }


# -------------------------------------------------------------- SciPy side
def _np_lap(u, h2):
    out = 4.0 * u.copy()
    out[1:, :] -= u[:-1, :]
    out[:-1, :] -= u[1:, :]
    out[:, 1:] -= u[:, :-1]
    out[:, :-1] -= u[:, 1:]
    return out / h2


def _np_restrict(r):
    # full weighting, vertex-centered (nx = 2 nc + 1)
    c = (
        4.0 * r[1::2, 1::2]
        + 2.0 * (r[0:-1:2, 1::2] + r[2::2, 1::2]
                 + r[1::2, 0:-1:2] + r[1::2, 2::2])
        + (r[0:-1:2, 0:-1:2] + r[0:-1:2, 2::2]
           + r[2::2, 0:-1:2] + r[2::2, 2::2])
    )
    return c / 16.0


def _np_prolong(c, nx):
    u = np.zeros((nx, nx), c.dtype)
    u[1::2, 1::2] = c
    u[0:-1:2, 1::2] += 0.5 * c
    u[2::2, 1::2] += 0.5 * c
    u[1::2, 0:-1:2] += 0.5 * c
    u[1::2, 2::2] += 0.5 * c
    for sl0 in (slice(0, -1, 2), slice(2, None, 2)):
        for sl1 in (slice(0, -1, 2), slice(2, None, 2)):
            u[sl0, sl1] += 0.25 * c
    return u


def _np_vcycle(r, nx, omega=0.8, nu=2, coarsest=31, coarse_sweeps=60):
    h2 = (1.0 / (nx + 1)) ** 2
    diag = 4.0 / h2
    if nx <= coarsest:
        u = np.zeros_like(r)
        for _ in range(coarse_sweeps):
            u += (omega / diag) * (r - _np_lap(u, h2))
        return u
    u = np.zeros_like(r)
    for _ in range(nu):
        u += (omega / diag) * (r - _np_lap(u, h2))
    res = r - _np_lap(u, h2)
    ec = _np_vcycle(_np_restrict(res), (nx - 1) // 2, omega, nu,
                    coarsest, coarse_sweeps)
    u += _np_prolong(ec, nx)
    for _ in range(nu):
        u += (omega / diag) * (r - _np_lap(u, h2))
    return u


def scipy_side(nx, time_budget_s=3600):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    N = nx * nx
    h = 1.0 / (nx + 1)
    h2 = h * h
    wx, wy = WIND
    main = (EPS * 4.0 / h2 + wx / h + wy / h) * np.ones(N)
    up = -(EPS / h2 + wx / h) * np.ones(N - nx)      # row i-1 neighbor
    dn = -(EPS / h2) * np.ones(N - nx)
    lf = -(EPS / h2 + wy / h) * np.ones(N - 1)
    rt = -(EPS / h2) * np.ones(N - 1)
    cut = np.arange(1, N) % nx == 0                  # row boundaries
    lf[cut] = 0.0
    rt[cut] = 0.0
    A = sp.diags([main, up, dn, lf, rt], [0, -nx, nx, -1, 1],
                 format="csr")
    b = np.ones(N)
    bnorm = np.linalg.norm(b)

    def ml(x):
        return _np_vcycle(
            np.asarray(x, np.float64).reshape(nx, nx), nx
        ).reshape(-1)

    M = spla.LinearOperator((N, N), matvec=ml)

    count = {"n": 0}

    def cb(_):
        count["n"] += 1

    t0 = time.perf_counter()
    x, _ = spla.gmres(
        A, b, rtol=TOL, restart=RESTART, maxiter=40 * RESTART, M=M,
        callback=cb, callback_type="legacy",
    )
    wall = time.perf_counter() - t0
    rel = float(np.linalg.norm(b - A @ x) / bnorm)
    return {
        "side": "scipy-cpu",
        "N": N,
        "wall_s": round(wall, 3),
        "rel_res64": rel,
        "converged": bool(rel <= TOL),
        "matvecs": count["n"],
    }


def main():
    nx = int(os.environ.get("NORTHSTAR_NX", "4095"))
    if (nx + 1) & nx != 0:
        raise SystemExit("NORTHSTAR_NX must be 2^k - 1 (multigrid nesting)")

    tpu = tpu_side(nx)
    print(json.dumps(tpu), flush=True)
    if os.environ.get("NORTHSTAR_TPU_ONLY"):
        # scale probes beyond the SciPy side's patience (e.g. 8191^2 =
        # 67M dof, where same-algorithm SciPy extrapolates to ~10 min):
        # report the TPU side alone
        return
    cpu = scipy_side(nx)
    print(json.dumps(cpu), flush=True)
    print(
        json.dumps(
            {
                "metric": f"northstar_convdiff_{tpu['N']}dof_"
                          "restarted_gmres_mg_refined_to_1e-8",
                "value": tpu["wall_s"],
                "unit": "s",
                "vs_baseline": round(cpu["wall_s"] / tpu["wall_s"], 2),
                "both_converged": tpu["converged"] and cpu["converged"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
