"""The third-session surface: eigensolver, least squares, and the
polynomial preconditioner, composed.

1. eigsh finds the troublesome low eigenpairs; its Ritz columns feed
   deflated GMRES directly.
2. A GMRES-polynomial preconditioner collapses outer iterations (and,
   on a mesh, all-reduces) for a nonsymmetric solve.
3. LSMR solves a damped least-squares problem (no reference analog:
   krypy requires square systems)."""

import numpy
import jax.numpy as jnp

from krypy_tpu import functional as F, ops


def eig_feeds_deflation():
    d = numpy.r_[1e-3, 5e-3, numpy.linspace(1, 10, 300)]
    A = ops.diagonal(jnp.asarray(d))
    b = jnp.ones(d.size, jnp.float64)

    eig = F.eigsh(A, k=2, which="sa", tol=1e-10)
    plain = F.gmres(A, b, tol=1e-8, maxiter=200)
    defl = F.deflated_gmres(A, b, eig.U, tol=1e-8, maxiter=200)
    print(
        f"eigsh: theta={numpy.asarray(eig.theta).round(6)}; "
        f"plain GMRES {int(plain.niter)} iters, "
        f"deflated-by-eigsh {int(defl.niter)} iters"
    )


def polynomial_preconditioning():
    rng = numpy.random.default_rng(0)
    n = 500
    S = rng.standard_normal((n, n)) * 0.5 / numpy.sqrt(n)
    A = jnp.asarray(numpy.diag(numpy.linspace(1, 100, n)) + S - S.T)
    b = jnp.asarray(rng.standard_normal(n))

    plain = F.gmres(A, b, tol=1e-10, maxiter=400)
    P = ops.gmres_polynomial_preconditioner(A, 8, seed=b)
    poly = F.gmres(A, b, Mr=P, tol=1e-10, maxiter=100)
    print(
        f"poly precond (degree {P.degree}): plain {int(plain.niter)} "
        f"outer iters -> {int(poly.niter)} (each now {P.degree + 1} "
        "matvecs, ZERO extra reductions)"
    )


def damped_least_squares():
    rng = numpy.random.default_rng(1)
    A = rng.standard_normal((400, 150))
    x_true = rng.standard_normal(150)
    b = A @ x_true + 0.05 * rng.standard_normal(400)

    r = F.lsmr(jnp.asarray(A), jnp.asarray(b), damp=0.1, tol=1e-10)
    xref, *_ = numpy.linalg.lstsq(
        numpy.vstack([A, 0.1 * numpy.eye(150)]),
        numpy.r_[b, numpy.zeros(150)],
        rcond=None,
    )
    err = numpy.linalg.norm(numpy.asarray(r.x) - xref)
    print(
        f"lsmr damp=0.1: {int(r.niter)} iters, "
        f"|x - lstsq_oracle| = {err:.2e}"
    )


def newton_krylov_bratu():
    """Nonlinear: the 1-D Bratu problem with autodiff JVPs -- no
    hand-coded Jacobian anywhere."""
    n = 150
    h = 1.0 / (n + 1)

    def residual(u):
        upad = jnp.pad(u, 1)
        lap = (upad[2:] - 2 * u + upad[:-2]) / h**2
        return lap + 3.0 * jnp.exp(u)

    r = F.newton_krylov(
        residual, jnp.zeros(n, jnp.float64), tol=1e-10,
        inner_maxiter=200, recycle=3,
    )
    print(
        f"newton_krylov (Bratu, lam=3): {r.niter} Newton steps, "
        f"{r.inner_iters} inner Krylov iterations (Ritz-recycled), "
        f"final ||F|| = {r.resnorms[-1]:.2e}"
    )


if __name__ == "__main__":
    eig_feeds_deflation()
    polynomial_preconditioning()
    damped_least_squares()
    newton_krylov_bratu()
