"""scipy-style one-call solver interface (reference: krypy/_convenience.py).

``cg``/``minres``/``gmres`` build a :class:`~krypy_tpu.linsys.LinearSystem`,
dispatch to the plain or deflated solver depending on whether a deflation
basis ``U`` is passed, and return ``(solution_or_None, solver)``.

Structure: all three one-liners funnel through a single driver
(:func:`_launch`) parameterized by a per-method spec row -- the solver
pair, the system flags the method assumes, and whether the method takes an
``ortho`` knob -- instead of three hand-expanded function bodies.
"""

import jax.numpy as jnp

from . import deflation, linsys

__all__ = ["cg", "minres", "gmres"]


def wrap_inner_product(inner):
    """Lift a scalar inner product ``inner(x_vec, y_vec)`` to the block
    form expected internally (reference semantics:
    krypy/_convenience.py:10-16)."""

    def _blocked(X, Y):
        if X.shape[1] == 0:
            return jnp.array([[]])
        return jnp.asarray(inner(X[:, 0], Y[:, 0])).reshape(1, 1)

    return _blocked


#: method name -> (plain solver, deflated solver, LinearSystem flags,
#: accepts ``ortho``)
_METHODS = {
    "cg": (
        linsys.Cg,
        deflation.DeflatedCg,
        dict(self_adjoint=True, positive_definite=True),
        False,
    ),
    "minres": (linsys.Minres, deflation.DeflatedMinres,
               dict(self_adjoint=True), True),
    "gmres": (linsys.Gmres, deflation.DeflatedGmres, dict(), True),
}


def _as_columns(v):
    """None-passthrough reshape of a vector/block to ``(N, cols)``."""
    if v is None:
        return None
    v = jnp.asarray(v)
    return v.reshape(v.shape[0], -1)


def _launch(method, A, b, options):
    """Shared driver of the one-liners: validate shapes, assemble the
    linear system with the method's assumed flags, pick the plain or
    deflated solver class, run it, and shape the result like ``b``."""
    if len(A.shape) != 2 or A.shape[0] != A.shape[1]:
        raise AssertionError("A must be square")
    if A.shape[1] != b.shape[0]:
        raise AssertionError("A and b dimensions mismatch")

    Plain, Deflated, flags, has_ortho = _METHODS[method]

    ip = options.pop("inner_product")
    system = linsys.LinearSystem(
        A=A,
        b=b,
        M=options.pop("M"),
        Minv=options.pop("Minv"),
        Ml=options.pop("Ml"),
        ip_B=wrap_inner_product(ip) if ip else ip,
        exact_solution=options.pop("exact_solution"),
        **flags,
    )
    # the reference accepts Mr but never forwards it; mirrored for parity
    options.pop("Mr")

    solver_kwargs = dict(
        x0=_as_columns(options.pop("x0")),
        tol=options.pop("tol"),
        maxiter=options.pop("maxiter"),
        explicit_residual=options.pop("use_explicit_residual"),
        store_arnoldi=options.pop("store_arnoldi"),
    )
    if has_ortho:
        solver_kwargs["ortho"] = options.pop("ortho")

    U = _as_columns(options.pop("U"))
    if options:
        raise TypeError(f"unexpected options: {sorted(options)}")

    if U is None:
        solver = Plain(system, **solver_kwargs)
    else:
        solver = Deflated(system, U=U, **solver_kwargs)

    converged = solver.resnorms[-1] < solver.tol
    x = jnp.reshape(solver.xk, b.shape) if converged else None
    return x, solver


def cg(
    A,
    b,
    M=None,
    Minv=None,
    Ml=None,
    Mr=None,
    inner_product=None,
    exact_solution=None,
    x0=None,
    U=None,
    tol=1e-5,
    maxiter=None,
    use_explicit_residual=False,
    store_arnoldi=False,
):
    """Conjugate gradient one-liner; see :class:`~krypy_tpu.linsys.Cg`.

    :return: ``(x, solver)`` with ``x=None`` if the tolerance was not
      reached.
    """
    return _launch("cg", A, b, dict(
        M=M, Minv=Minv, Ml=Ml, Mr=Mr, inner_product=inner_product,
        exact_solution=exact_solution, x0=x0, U=U, tol=tol, maxiter=maxiter,
        use_explicit_residual=use_explicit_residual,
        store_arnoldi=store_arnoldi,
    ))


def minres(
    A,
    b,
    M=None,
    Minv=None,
    Ml=None,
    Mr=None,
    inner_product=None,
    exact_solution=None,
    ortho="mgs",
    x0=None,
    U=None,
    tol=1e-5,
    maxiter=None,
    use_explicit_residual=False,
    store_arnoldi=False,
):
    """MINRES one-liner; see :class:`~krypy_tpu.linsys.Minres`."""
    return _launch("minres", A, b, dict(
        M=M, Minv=Minv, Ml=Ml, Mr=Mr, inner_product=inner_product,
        exact_solution=exact_solution, ortho=ortho, x0=x0, U=U, tol=tol,
        maxiter=maxiter, use_explicit_residual=use_explicit_residual,
        store_arnoldi=store_arnoldi,
    ))


def gmres(
    A,
    b,
    M=None,
    Minv=None,
    Ml=None,
    Mr=None,
    inner_product=None,
    exact_solution=None,
    ortho="mgs",
    x0=None,
    U=None,
    tol=1e-5,
    maxiter=None,
    use_explicit_residual=False,
    store_arnoldi=False,
):
    """GMRES one-liner; see :class:`~krypy_tpu.linsys.Gmres`."""
    return _launch("gmres", A, b, dict(
        M=M, Minv=Minv, Ml=Ml, Mr=Mr, inner_product=inner_product,
        exact_solution=exact_solution, ortho=ortho, x0=x0, U=U, tol=tol,
        maxiter=maxiter, use_explicit_residual=use_explicit_residual,
        store_arnoldi=store_arnoldi,
    ))
