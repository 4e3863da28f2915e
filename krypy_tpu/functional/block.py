r"""Block CG: one solve for multiple right-hand sides.

Not a reference capability (krypy solves a single rhs per call, its
``(N, 1)`` vectors notwithstanding) -- this is TPU-native surface: every
operation of the block method is an ``(N, k)`` GEMM or a ``(k, k)``
factorization, exactly the shapes the MXU wants, and the k systems share
every matvec's HBM traffic.

Algorithm: classical block CG (O'Leary 1980) with the standard
rank-collapse guard: when columns converge (or become linearly
dependent) the k x k Gram matrices turn singular, so the small solves
are regularized by an eigenvalue floor relative to the largest
eigenvalue -- converged columns then simply stop moving while the rest
keep the full block-Krylov acceleration.
"""

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .common import (
    BREAKDOWN,
    CONVERGED,
    MAXITER,
    SolveResult,
    apply,
    as_matvec,
    cast_matvec,
    system_dtype,
)

__all__ = ["block_cg"]


class _BlockCgState(NamedTuple):
    it: jnp.ndarray
    X: jnp.ndarray            # (N, k) iterates
    R: jnp.ndarray            # (N, k) residuals
    Z: jnp.ndarray            # (N, k) preconditioned residuals
    P: jnp.ndarray            # (N, k) search directions
    rels: jnp.ndarray         # (k,) per-column relative residuals
    max_rel: jnp.ndarray
    broken: jnp.ndarray
    resnorms: jnp.ndarray     # (maxiter+1, k)


def _guarded_solve(G, rhs, floor_ratio):
    """Solve the Hermitian small system ``G a = rhs`` with an eigenvalue
    floor: eigenvalues below ``floor_ratio * lambda_max`` are treated as
    converged/dependent directions and their components zeroed."""
    Gh = 0.5 * (G + G.conj().T)
    w, V = jnp.linalg.eigh(Gh)
    wmax = jnp.maximum(jnp.max(jnp.abs(w)), 1e-300)
    keep = w > floor_ratio * wmax
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    return V @ (winv[:, None] * (V.conj().T @ rhs))


def block_cg(
    A,
    B,
    *,
    M=None,
    X0=None,
    tol=1e-5,
    maxiter=None,
    floor_ratio=1e-12,
):
    """Solve SPD ``A X = B`` for all columns of ``B`` simultaneously.

    :param B: right-hand sides, shape ``(N, k)``.
    :param M: optional SPD preconditioner matvec (applied columnwise).
    :param tol: per-column relative residual target (Euclidean); the
      solve runs until EVERY column converges.
    :param floor_ratio: relative eigenvalue floor of the direction Gram
      matrix below which directions are dropped (rank-collapse guard).
    :return: :class:`~krypy_tpu.functional.common.SolveResult` with
      ``x`` of shape ``(N, k)`` and ``resnorms`` of shape
      ``(maxiter+1, k)`` (NaN beyond ``niter``).
    """
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError("block_cg expects B with shape (N, k)")
    N, k = B.shape
    # NOTE: ceil(N/k) is NOT a safe default bound -- it assumes a
    # full-rank block (rank-deficient rhs, e.g. duplicated columns,
    # converge like single-rhs CG).  The default matches cg's N; pass
    # maxiter explicitly at large N, since the per-column history
    # buffer is (maxiter+1, k).
    maxiter = N if maxiter is None else int(maxiter)

    A_mv = as_matvec(A)
    M_mv = as_matvec(M)
    dtype = system_dtype(B, X0)
    B = B.astype(dtype)
    A_mv, M_mv = (cast_matvec(f, dtype) for f in (A_mv, M_mv))
    real_dtype = jnp.zeros(0, dtype).real.dtype

    def blk(mv):
        """Lift a matvec to blocks: operators that natively accept
        ``(N, j)`` blocks (matrices) are used directly; matvec-only
        operators (stencils) are applied columnwise.  The probe uses a
        SINGLE column, so elementwise operators whose broadcast happens
        to reproduce B's shape when k == N cannot fool it; it runs at
        trace time, so the decision is static and the probe op is dead
        code the compiler drops."""
        if mv is None:
            return None
        try:
            probe = mv(B[:, :1])
            if probe.shape == (N, 1):
                return mv
        except Exception:  # noqa -- shape/rank mismatch: columnwise
            pass
        return lambda X: jnp.stack(
            [mv(X[:, j]) for j in range(k)], axis=1
        )

    A_blk = blk(A_mv)
    M_blk = blk(M_mv)

    X0v = (
        jnp.zeros((N, k), dtype)
        if X0 is None
        else jnp.asarray(X0).astype(dtype)
    )
    bnorms = jnp.maximum(
        jnp.linalg.norm(B, axis=0).astype(real_dtype), 1e-300
    )

    R0 = B - A_blk(X0v)
    Z0 = apply(M_blk, R0)
    rels0 = (jnp.linalg.norm(R0, axis=0) / bnorms).astype(real_dtype)

    resnorms0 = jnp.full((maxiter + 1, k), jnp.nan, real_dtype)
    resnorms0 = resnorms0.at[0].set(rels0)

    def body(state):
        Q = A_blk(state.P)
        PQ = jnp.dot(state.P.conj().T, Q)            # (k, k)
        PR = jnp.dot(state.P.conj().T, state.R)
        alpha = _guarded_solve(PQ, PR, floor_ratio)
        X = state.X + jnp.dot(state.P, alpha)
        R = state.R - jnp.dot(Q, alpha)
        Z = apply(M_blk, R)
        QZ = jnp.dot(Q.conj().T, Z)
        beta = -_guarded_solve(PQ, QZ, floor_ratio)
        P = Z + jnp.dot(state.P, beta)

        rels = (jnp.linalg.norm(R, axis=0) / bnorms).astype(real_dtype)
        max_rel = jnp.max(rels)
        broken = ~jnp.isfinite(max_rel)
        resnorms = state.resnorms.at[state.it + 1].set(rels)
        return _BlockCgState(
            state.it + 1, X, R, Z, P, rels, max_rel, broken, resnorms
        )

    def cond(state):
        return (
            (state.max_rel > tol)
            & (state.it < maxiter)
            & ~state.broken
        )

    init = _BlockCgState(
        jnp.asarray(0),
        X0v,
        R0,
        Z0,
        Z0,
        rels0,
        jnp.max(rels0),
        jnp.asarray(False),
        resnorms0,
    )
    final = lax.while_loop(cond, body, init)

    status = jnp.where(
        final.max_rel <= tol,
        CONVERGED,
        jnp.where(final.broken, BREAKDOWN, MAXITER),
    )
    return SolveResult(
        x=final.X,
        resnorms=final.resnorms,
        niter=final.it,
        status=status,
    )
