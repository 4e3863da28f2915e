"""Mixed-precision iterative refinement.

float32 Krylov solves hit an attainable-accuracy floor around 1e-6..1e-7
relative residual (and diverge if pushed past it -- see docs/DESIGN.md).
Refinement restores arbitrary accuracy at float32 speed: the outer loop
computes the TRUE residual in float64, the inner compiled solver produces
a float32 correction, and each cycle multiplies the residual by roughly
the inner solve's reduction factor.  This is the standard Wilkinson
iterative-refinement scheme, with the inner solver being any functional
core (CG/MINRES/GMRES, deflated or preconditioned).

The reference has no analog (it runs float64 end to end on CPU); this is
the TPU-native mechanism by which the framework reaches the reference's
float64-grade tolerances while keeping the bulk flops in float32/bfloat16
on the VPU/MXU.
"""

import time

import jax
import jax.numpy as jnp

from .common import CONVERGED, MAXITER, SolveResult

__all__ = ["refine_to"]


def refine_to(
    A64,
    b,
    inner_solve,
    *,
    tol=1e-8,
    max_cycles=20,
    x0=None,
    inner_dtype=jnp.float32,
):
    """Solve ``A x = b`` to float64 relative residual ``tol`` by iterative
    refinement around a lower-precision compiled inner solver.

    :param A64: float64-capable matvec callable (its dtype follows the
      input vector; stencil operators in :mod:`krypy_tpu.ops` do this).
    :param b: right-hand side (promoted to float64 for the outer loop).
    :param inner_solve: callable ``r_low -> SolveResult`` producing an
      approximate correction for residual ``r_low`` (typically a jitted
      functional solver at ``tol`` around the float32 floor).  The
      returned ``x`` is interpreted as the correction.
    :param tol: target float64 relative residual.
    :param max_cycles: refinement cycle cap.
    :param x0: optional initial guess.
    :param inner_dtype: dtype the residual is cast to for the inner solve.
    :return: ``(SolveResult, info)`` where the result carries the float64
      iterate and the per-cycle outer residuals, and ``info`` has
      ``cycles``, ``inner_iters``, ``wall_s``.

    The loop stops early when the outer residual stagnates (the inner
    solver can no longer improve the iterate), returning the best iterate.
    """
    b64 = jnp.asarray(b, jnp.float64)
    bnorm = float(jnp.linalg.norm(b64))

    @jax.jit
    def true_residual(x):
        return b64 - A64(x)

    x = (
        jnp.zeros_like(b64)
        if x0 is None
        else jnp.asarray(x0, jnp.float64)
    )
    # warm the outer-residual and norm compiles before the timer starts
    # (compiles through this environment's remote-compile tunnel can take
    # minutes at large N and must not be billed to the solve)
    float(jnp.linalg.norm(true_residual(x)))
    t0 = time.perf_counter()
    outer = []
    inner_iters = 0
    best_x, best_rel = x, float("inf")
    # max_cycles + 1 residual evaluations bracket max_cycles corrections,
    # so the final correction is always measured (and can win best_x)
    for cycle in range(max_cycles + 1):
        r = true_residual(x)
        rel = float(jnp.linalg.norm(r)) / bnorm if bnorm else 0.0
        outer.append(rel)
        if rel < best_rel:
            best_x, best_rel = x, rel
        if (
            rel <= tol
            or cycle == max_cycles
            or (len(outer) > 1 and rel >= outer[-2])
        ):
            break
        res = inner_solve(r.astype(inner_dtype))
        inner_iters += int(res.niter)
        x = x + res.x.astype(jnp.float64)
    wall = time.perf_counter() - t0

    status = CONVERGED if best_rel <= tol else MAXITER
    result = SolveResult(
        x=best_x,
        resnorms=jnp.asarray(outer),
        niter=jnp.asarray(len(outer) - 1),
        status=jnp.asarray(status),
    )
    return result, {
        "cycles": len(outer) - 1,
        "inner_iters": inner_iters,
        "wall_s": wall,
    }
