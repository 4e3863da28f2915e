"""scipy-style one-call solver interface (reference: krypy/_convenience.py).

``cg``/``minres``/``gmres`` build a :class:`~krypy_tpu.linsys.LinearSystem`,
dispatch to the plain or deflated solver depending on whether a deflation
basis ``U`` is passed, and return ``(solution_or_None, solver)``.
"""

import jax.numpy as jnp

from .deflation import DeflatedCg, DeflatedGmres, DeflatedMinres
from .linsys import Cg, Gmres, LinearSystem, Minres

__all__ = ["cg", "minres", "gmres"]


def wrap_inner_product(inner):
    """Lift a scalar inner product ``inner(x_vec, y_vec)`` to the block
    form expected internally (reference: krypy/_convenience.py:10-16)."""

    def _wrap(a, b):
        if a.shape[1] == 0:
            return jnp.array([[]])
        return jnp.array([[inner(a[:, 0], b[:, 0])]])

    return _wrap


def _prepare(A, b, U, x0, inner_product):
    assert len(A.shape) == 2
    assert A.shape[0] == A.shape[1]
    assert A.shape[1] == b.shape[0]
    if inner_product:
        inner_product = wrap_inner_product(inner_product)
    if U is not None:
        U = jnp.reshape(jnp.asarray(U), (U.shape[0], -1))
    if x0 is not None:
        x0 = jnp.reshape(jnp.asarray(x0), (x0.shape[0], -1))
    return U, x0, inner_product


def _result(out, b):
    sol = (
        jnp.reshape(out.xk, b.shape)
        if out.resnorms[-1] < out.tol
        else None
    )
    return sol, out


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
    U, x0, inner_product = _prepare(A, b, U, x0, inner_product)
    linear_system = LinearSystem(
        A=A,
        b=b,
        M=M,
        Minv=Minv,
        Ml=Ml,
        ip_B=inner_product,
        self_adjoint=True,
        positive_definite=True,
        exact_solution=exact_solution,
    )
    kwargs = dict(
        x0=x0,
        tol=tol,
        maxiter=maxiter,
        explicit_residual=use_explicit_residual,
        store_arnoldi=store_arnoldi,
    )
    if U is None:
        out = Cg(linear_system, **kwargs)
    else:
        out = DeflatedCg(linear_system, U=U, **kwargs)
    return _result(out, b)


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
    U, x0, inner_product = _prepare(A, b, U, x0, inner_product)
    linear_system = LinearSystem(
        A=A,
        b=b,
        M=M,
        Minv=Minv,
        Ml=Ml,
        ip_B=inner_product,
        self_adjoint=True,
        exact_solution=exact_solution,
    )
    kwargs = dict(
        ortho=ortho,
        x0=x0,
        tol=tol,
        maxiter=maxiter,
        explicit_residual=use_explicit_residual,
        store_arnoldi=store_arnoldi,
    )
    if U is None:
        out = Minres(linear_system, **kwargs)
    else:
        out = DeflatedMinres(linear_system, U=U, **kwargs)
    return _result(out, b)


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
    U, x0, inner_product = _prepare(A, b, U, x0, inner_product)
    linear_system = LinearSystem(
        A=A,
        b=b,
        M=M,
        Minv=Minv,
        Ml=Ml,
        ip_B=inner_product,
        exact_solution=exact_solution,
    )
    kwargs = dict(
        ortho=ortho,
        x0=x0,
        tol=tol,
        maxiter=maxiter,
        explicit_residual=use_explicit_residual,
        store_arnoldi=store_arnoldi,
    )
    if U is None:
        out = Gmres(linear_system, **kwargs)
    else:
        out = DeflatedGmres(linear_system, U=U, **kwargs)
    return _result(out, b)
