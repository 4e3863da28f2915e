r"""Multi-shift GMRES: solve (A + sigma_i I) x_i = b for MANY shifts
from ONE Krylov basis.

Krylov spaces are shift-invariant -- :math:`K_m(A, b) = K_m(A + \sigma
I, b)` -- so a single Arnoldi basis serves every shifted system: the
per-shift work is a small projected least squares with
:math:`H + \sigma \bar I`, and the solution assembly for ALL shifts is
one ``(n_shifts, m) x (m, N)`` GEMM.  Standard tool for Tikhonov
parameter sweeps, rational matrix-function approximation, and
frequency-domain solves.

TPU-native mapping: the expensive part (basis build) is the usual
batched-CGS2 Arnoldi; the per-shift small solves are ``jax.vmap`` over
the replicated ``(m+1, m)`` Hessenberg -- thousands of shifts cost one
batched QR on dense MXU-shaped tiles; the assembly GEMM reads the basis
exactly once for all shifts.  The reference solves shifted systems one
at a time, rebuilding the Krylov space per shift (krypy has no
multi-shift surface).

Limitations (inherent to shift invariance, not this implementation):
no preconditioning (M(A + sigma I) is not a shifted family), Euclidean
inner product, zero initial guess (all systems must share the residual
direction b).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .arnoldi import arnoldi
from .common import (
    CONVERGED,
    MAXITER,
    as_matvec,
    safe_div,
    system_dtype,
)

__all__ = ["shifted_gmres", "ShiftedResult"]


class ShiftedResult(NamedTuple):
    """Result of :func:`shifted_gmres`."""

    #: solutions, shape ``(n_shifts, N)`` (row i solves ``(A + shifts[i]
    #: I) x = b``)
    X: jnp.ndarray
    #: final relative residual per shift, shape ``(n_shifts,)``
    resnorms: jnp.ndarray
    #: Krylov dimension actually built (shared by all shifts)
    niter: jnp.ndarray
    #: CONVERGED / MAXITER per shift, shape ``(n_shifts,)``
    status: jnp.ndarray

    @property
    def converged(self):
        return self.status == CONVERGED


def shifted_gmres(A, b, shifts, *, maxiter=50, tol=1e-8, ortho="cgs2"):
    r"""Solve the shifted family ``(A + shifts[i] I) x_i = b`` with one
    Krylov basis.

    :param A: operator (matvec / matrix / LinearOperator); the family
      member for shift 0.
    :param shifts: array of shifts ``(n_shifts,)``; complex shifts on a
      real operator promote the small solves (and the solutions) to
      complex while the basis build stays real.
    :param maxiter: Krylov dimension m (single cycle -- after a restart
      the shifted residuals lose collinearity, so this solver reports
      per-shift status honestly instead of restarting; raise m or
      deflate instead).
    :param tol: per-shift relative residual target.
    :return: :class:`ShiftedResult`.
    """
    b = jnp.asarray(b)
    bv = b.reshape(-1)
    N = bv.shape[0]
    m = min(int(maxiter), N)
    shifts = jnp.asarray(shifts).reshape(-1)

    A_mv = as_matvec(A)
    dtype = system_dtype(bv)
    small_dtype = jnp.promote_types(dtype, shifts.dtype)
    shifts = shifts.astype(small_dtype)

    rel = arnoldi(A_mv, bv, maxiter=m, ortho=ortho)
    V, H, k = rel.V, rel.H, rel.niter
    beta = jnp.linalg.norm(bv)

    # masked fixed-shape least squares, one per shift (vmapped): columns
    # >= k are replaced by orthonormal unit columns so their y entries
    # vanish (same device idiom as ca_gmres's block LS)
    col_mask = jnp.arange(m) < k
    sub_diag = jnp.eye(m + 1, m, k=-1, dtype=small_dtype)
    shift_rows = jnp.eye(m + 1, m, dtype=small_dtype)
    rhs = jnp.zeros(m + 1, small_dtype).at[0].set(
        beta.astype(small_dtype)
    )
    Hs = H.astype(small_dtype)

    def solve_one(sigma):
        Hm = jnp.where(
            col_mask[None, :], Hs + sigma * shift_rows, sub_diag
        )
        q, r = jnp.linalg.qr(Hm, mode="reduced")
        y = jax.scipy.linalg.solve_triangular(
            r, jnp.dot(q.conj().T, rhs)
        )
        res = jnp.linalg.norm(rhs - jnp.dot(Hm, y))
        return y, res

    Y, res = jax.vmap(solve_one)(shifts)          # (s, m), (s,)

    # all solutions in ONE basis GEMM
    X = jnp.dot(Y, V[:m].astype(small_dtype))     # (s, N)

    rel_res = jax.vmap(lambda r: safe_div(r, beta))(res)
    status = jnp.where(rel_res <= tol, CONVERGED, MAXITER)
    return ShiftedResult(
        X=X, resnorms=rel_res, niter=k, status=status
    )
