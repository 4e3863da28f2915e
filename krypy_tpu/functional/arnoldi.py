"""Jitted Arnoldi/Lanczos relation builder.

The TPU-lane counterpart of :func:`krypy_tpu.utils.arnoldi` (reference:
krypy/utils.py:854-1081): builds :math:`A V_n = V_{n+1}\\underline{H}_n`
in one compiled ``while_loop`` with fixed-shape buffers, returning the
basis, the Hessenberg matrix, the achieved dimension and the invariance
flag.  Feeds :func:`krypy_tpu.utils.ritz` (host) or the deflation-vector
extraction directly.
"""

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .common import (
    apply,
    as_matvec,
    breakdown_threshold,
    make_inner,
    norm_from_pair,
    safe_div,
    system_dtype,
)

__all__ = ["arnoldi", "ArnoldiResult"]


class ArnoldiResult(NamedTuple):
    #: basis rows, shape ``(maxiter+1, N)``; rows beyond ``niter(+1)`` are 0
    V: jnp.ndarray
    #: Hessenberg buffer ``(maxiter+1, maxiter)``
    H: jnp.ndarray
    #: dual basis rows (``V = M P``) or None
    P: jnp.ndarray
    #: number of completed iterations n
    niter: jnp.ndarray
    #: True if the Krylov subspace became invariant (then
    #: :math:`A V_n = V_n H_n` with the leading n x n block)
    invariant: jnp.ndarray


class _State(NamedTuple):
    k: jnp.ndarray
    V: jnp.ndarray
    P: jnp.ndarray
    H: jnp.ndarray
    hsq: jnp.ndarray
    invariant: jnp.ndarray


def arnoldi(A, v, *, maxiter=None, ortho="cgs2", M=None, ip=None):
    """Build the Arnoldi (or Lanczos, with ``ortho='lanczos'``) relation.

    :param A: matvec / matrix / LinearOperator.
    :param v: initial vector ``(N,)``.
    :param ortho: ``'cgs'``/``'cgs2'`` (batched, TPU-fast),
      ``'mgs'``/``'dmgs'`` (sequential fidelity), ``'lanczos'``.
    :param M: optional SPD preconditioner; a dual basis P with ``V = M P``
      is maintained (reference: krypy/utils.py:874-878).
    :param ip: inner product (None / matrix / scalar callable).
    """
    v = jnp.asarray(v).reshape(-1)
    N = v.shape[0]
    m = N if maxiter is None else int(maxiter)

    A_mv = as_matvec(A)
    M_mv = as_matvec(M)
    pair, rows = make_inner(ip)
    with_M = M_mv is not None
    lanczos = ortho == "lanczos"
    passes = {"cgs": 1, "cgs2": 2, "mgs": 1, "dmgs": 2, "lanczos": 1}[ortho]
    sequential = ortho in ("mgs", "dmgs")

    dtype = system_dtype(v)
    v = v.astype(dtype)
    real_dtype = jnp.zeros(0, dtype).real.dtype
    brk = breakdown_threshold(dtype)

    if with_M:
        Mv = M_mv(v)
        vnorm = norm_from_pair(pair, v, Mv)
        first_v = Mv * safe_div(1.0, vnorm)
        first_p = v * safe_div(1.0, vnorm)
    else:
        vnorm = norm_from_pair(pair, v)
        first_v = v * safe_div(1.0, vnorm)
        first_p = jnp.zeros(0, dtype)

    V0 = jnp.zeros((m + 1, N), dtype).at[0].set(first_v)
    P0 = (
        jnp.zeros((m + 1, N), dtype).at[0].set(first_p)
        if with_M
        else jnp.zeros((0, 0), dtype)
    )

    def orthogonalize(V, P, w, k):
        basis = P if with_M else V
        h = jnp.zeros(m + 1, dtype)
        if lanczos:
            # three-term recurrence: project on rows k-1 and k only
            mask = (jnp.arange(m + 1) == k) | (
                (jnp.arange(m + 1) == k - 1) & (k > 0)
            )
            coeffs = jnp.real(rows(V, w)) * mask
            w = w - jnp.dot(coeffs.astype(dtype), basis)
            h = h + coeffs.astype(dtype)
        elif sequential:
            def j_body(j, carry):
                w, h = carry
                coeff = jnp.where(
                    j <= k, rows(V[j][None, :], w)[0], 0.0
                )
                return (w - coeff * basis[j], h.at[j].add(coeff))

            for _ in range(passes):
                w, h = lax.fori_loop(0, m + 1, j_body, (w, h))
        else:
            mask = jnp.arange(m + 1) <= k
            for _ in range(passes):
                coeffs = rows(V, w) * mask
                w = w - jnp.dot(coeffs, basis)
                h = h + coeffs
        return w, h

    def cond(state):
        return (state.k < m) & jnp.logical_not(state.invariant)

    def body(state):
        k = state.k
        w = A_mv(state.V[k])
        w, h = orthogonalize(state.V, state.P, w, k)
        if lanczos:
            # symmetrize: H[k-1, k] = H[k, k-1] (reference:
            # krypy/utils.py:1003)
            prev_beta = jnp.where(
                k > 0, state.H[k, jnp.maximum(k - 1, 0)], 0.0
            )
            h = jnp.where(jnp.arange(m + 1) == k - 1, prev_beta, h)

        if with_M:
            Mw = apply(M_mv, w)
            hnew = norm_from_pair(pair, w, Mw)
        else:
            hnew = norm_from_pair(pair, w)

        hsq = state.hsq + jnp.sum(jnp.abs(h) ** 2) + hnew**2
        invariant = hnew <= brk * jnp.sqrt(hsq)
        h = h.at[k + 1].set(hnew.astype(dtype))
        H = state.H.at[:, k].set(h)

        inv_h = jnp.where(invariant, 0.0, safe_div(1.0, hnew))
        if with_M:
            P = state.P.at[k + 1].set(w * inv_h)
            V = state.V.at[k + 1].set(Mw * inv_h)
        else:
            P = state.P
            V = state.V.at[k + 1].set(w * inv_h)
        return _State(k + 1, V, P, H, hsq, invariant)

    init = _State(
        jnp.asarray(0),
        V0,
        P0,
        jnp.zeros((m + 1, m), dtype),
        jnp.asarray(0.0, real_dtype),
        vnorm == 0,
    )
    final = lax.while_loop(cond, body, init)
    return ArnoldiResult(
        V=final.V,
        H=final.H,
        P=final.P if with_M else None,
        niter=final.k,
        invariant=final.invariant,
    )
