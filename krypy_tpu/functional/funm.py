r"""Krylov approximation of matrix-function actions f(A) b.

For Hermitian :math:`A` and an analytic :math:`f`, the Lanczos
approximation is :math:`f(A) b \approx \beta\, V_m^T f(T_m) e_1` with
:math:`T_m = V_m A V_m^T` -- exact once the Krylov space captures the
spectrum seen by ``b``, and exponentially convergent in m for entire
functions like exp (matrix exponentials are the workhorse of
exponential time integrators; scipy's analog is
``scipy.sparse.linalg.expm_multiply``).

TPU-native design: the basis build is the same full-CGS2 Lanczos sweep
as :func:`~krypy_tpu.functional.eigh.eigsh` (two fused MXU contractions
per step), :math:`f(T_m)` is evaluated on device via ``jnp.linalg.eigh``
of the small replicated projection, and the whole computation -- sweep,
eigendecomposition, assembly, and the standard a-posteriori error
estimate -- jits into one dispatch.  The reference has no matrix-function
surface (krypy is linear-systems only).
"""

from typing import NamedTuple

import jax.numpy as jnp

from .common import (
    as_matvec,
    breakdown_threshold,
    cast_matvec,
    safe_div,
    system_dtype,
)

__all__ = ["funm_krylov", "expm_multiply"]


class FunmResult(NamedTuple):
    """Result of :func:`funm_krylov`."""

    #: the approximation to f(A) b, shape like b
    x: jnp.ndarray
    #: sequence of correction magnitudes ||x_m - x_{m-1}|| per step used
    #: as the a-posteriori error estimate (NaN below the start index)
    corrections: jnp.ndarray
    #: Krylov dimension used
    m: int


def funm_krylov(A, b, f, *, maxdim=30):
    r"""Approximate ``f(A) b`` for Hermitian ``A`` by the Lanczos method.

    :param A: Hermitian operator (matvec / matrix / LinearOperator).
    :param b: vector ``(N,)``.
    :param f: scalar function applied to eigenvalues, as a jittable
      callable on arrays (e.g. ``jnp.exp``, ``jnp.sqrt``,
      ``lambda w: 1/jnp.sqrt(w)``).  Must be well-defined on the
      spectrum sampled by the Krylov space.
    :param maxdim: Krylov dimension m.  The returned ``corrections``
      array holds :math:`\|x_j - x_{j-1}\|` for j = 2..m computed from
      the SAME basis (cheap small-matrix work), the standard
      a-posteriori estimate -- inspect its tail to judge convergence and
      re-run with a larger m if needed (static shapes: m is a
      compile-time constant, as everywhere in this framework).
    :return: :class:`FunmResult`.
    """
    b = jnp.asarray(b)
    flat = b.ndim == 1
    bv = b.reshape(-1)
    N = bv.shape[0]
    m = min(int(maxdim), N)

    A_mv = as_matvec(A)
    dtype = system_dtype(bv)
    bv = bv.astype(dtype)
    A_mv = cast_matvec(A_mv, dtype)
    real_dtype = jnp.zeros(0, dtype).real.dtype

    beta = jnp.linalg.norm(bv)
    V = jnp.zeros((m + 1, N), dtype).at[0].set(bv * safe_div(1.0, beta))
    H = jnp.zeros((m + 1, m + 1), dtype)
    row_idx = jnp.arange(m + 1)

    # full-CGS2 Lanczos sweep (same scheme as eigh.py: batched MXU
    # contractions; coefficients of both passes accumulate into H).
    # Invariance guard: normalizing a round-off-sized residual would
    # inject a garbage direction whose Rayleigh quotient is unbounded
    # (catastrophic under f=exp); deflate to a zero row instead -- the
    # projection then stays block diagonal and the dead block's
    # eigenvectors have zero e1-component, contributing nothing.
    brk = breakdown_threshold(dtype)
    for j in range(m):
        w = A_mv(V[j])
        mask = (row_idx <= j).astype(real_dtype)
        for _ in range(2):
            c = jnp.dot(V.conj(), w) * mask
            w = w - jnp.dot(c, V)
            H = H.at[:, j].add(c)
        hj = jnp.linalg.norm(w)
        alive = hj > brk * jnp.linalg.norm(H[: j + 1, j])
        H = H.at[j + 1, j].set(
            jnp.where(alive, hj, 0.0).astype(dtype)
        )
        V = V.at[j + 1].set(
            jnp.where(alive, 1.0, 0.0) * w * safe_div(1.0, hj)
        )

    Tm = H[:m, :m]
    Tm = 0.5 * (Tm + Tm.conj().T)
    theta, S = jnp.linalg.eigh(Tm)

    # f(T) e1 for every leading block size j simultaneously: y_j =
    # S_j f(theta_j) S_j^H e1 needs per-j eigensolves; instead use the
    # full-m eigendecomposition for x and estimate the error from the
    # correction sequence of nested Krylov approximations computed with
    # per-j eigh on the small (replicated) blocks -- j in a Python loop
    # over a handful of tail sizes keeps the compiled graph small.
    fe1 = jnp.dot(S, f(theta).astype(dtype) * S[0].conj()) * beta.astype(
        dtype
    )
    x = jnp.dot(fe1, V[:m])

    corrections = jnp.full(m + 1, jnp.nan, real_dtype)
    for j in range(max(2, m - 4), m):
        Tj = 0.5 * (H[:j, :j] + H[:j, :j].conj().T)
        tj, Sj = jnp.linalg.eigh(Tj)
        fj = jnp.dot(
            Sj, f(tj).astype(dtype) * Sj[0].conj()
        ) * beta.astype(dtype)
        # ||x_m - x_j|| via the coefficient difference (V orthonormal)
        diff = fe1 - jnp.concatenate(
            [fj, jnp.zeros(m - j, dtype)]
        )
        corrections = corrections.at[j].set(jnp.linalg.norm(diff))

    return FunmResult(
        x=x if flat else x[:, None],
        corrections=corrections,
        m=m,
    )


def expm_multiply(A, b, t=1.0, *, maxdim=30):
    r"""``exp(t A) b`` for Hermitian ``A`` (Lanczos; see
    :func:`funm_krylov`).  ``t`` may be negative (diffusion semigroups:
    ``expm_multiply(lap, b, -dt)``)."""
    t = float(t)
    return funm_krylov(A, b, lambda w: jnp.exp(t * w), maxdim=maxdim)
