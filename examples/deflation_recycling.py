"""Deflation and recycling, both lanes.

1. Deflate a known troublesome eigendirection (compatibility lane).
2. Recycle automatically-selected Ritz vectors across a sequence of
   slowly varying systems (functional lane, one compiled dispatch per
   solve)."""

import numpy
import jax.numpy as jnp

from krypy_tpu import deflation, linsys, recycling
from krypy_tpu import functional as F, ops


def compat_lane():
    N = 100
    d = numpy.linspace(1, 2, N)
    d[0] = 1e-4  # outlier eigenvalue slowing convergence
    A = numpy.diag(d)
    b = numpy.ones((N, 1))
    ls = linsys.LinearSystem(
        A, b, self_adjoint=True, positive_definite=True
    )

    plain = linsys.Gmres(ls, tol=1e-8)
    U = numpy.eye(N, 1)  # the outlier eigenvector
    defl = deflation.DeflatedGmres(ls, U=U, tol=1e-8)
    print(
        f"compat: plain GMRES {len(plain.resnorms) - 1} iters, "
        f"deflated {len(defl.resnorms) - 1} iters"
    )

    # automatic recycling over repeated solves
    rec = recycling.RecyclingGmres(
        vector_factory=recycling.factories.RitzFactorySimple(
            n_vectors=3, which="sm"
        )
    )
    iters = []
    for _ in range(3):
        sol = rec.solve(ls, tol=1e-8)
        iters.append(len(sol.resnorms) - 1)
    print(f"compat recycling iterations per solve: {iters}")


def functional_lane():
    n = 200
    base = numpy.linspace(1, 2, n)
    base[:4] = [1e-6, 1e-3, 5e-3, 2e-2]
    rec = F.RecyclingGmres(n_vectors=3, which="sm", hermitian=True)
    b = jnp.ones(n)
    iters = []
    for i in range(4):
        op = ops.diagonal(jnp.asarray(base * (1.0 + 0.01 * i)))
        r = rec.solve(op, b, tol=1e-6, maxiter=n)
        iters.append(int(r.niter))
    print(f"functional recycling iterations per solve: {iters}")


def auto_width_lane():
    """AutoRecyclingGmres picks the deflation width per solve by
    pricing candidate widths with the a-priori iteration bound and the
    measured per-iteration wall of each compiled core -- here it should
    discover that width 4 (the planted outlier count) pays."""
    n = 200
    base = numpy.linspace(1, 2, n)
    base[:4] = [1e-6, 1e-3, 5e-3, 2e-2]
    auto = F.AutoRecyclingGmres(max_vectors=4, hermitian=True)
    b = jnp.ones(n)
    iters = []
    for i in range(4):
        op = ops.diagonal(jnp.asarray(base * (1.0 + 0.01 * i)))
        r = auto.solve(op, b, tol=1e-6, maxiter=n)
        iters.append(int(r.niter))
    print(
        f"auto recycling iterations per solve: {iters}, "
        f"selected widths: {auto.selected_widths}"
    )


if __name__ == "__main__":
    compat_lane()
    functional_lane()
    auto_width_lane()
