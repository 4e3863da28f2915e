"""Jacobian-free Newton-Krylov (functional.newton_krylov).

The reference has no nonlinear driver (its recycling demo consumes
hand-built dense Jacobian systems); here the Jacobian action is
jax.jvp, so F is any jittable function.  Oracle: scipy.optimize's
newton_krylov on the same residual.
"""

import numpy

import jax.numpy as jnp

from krypy_tpu import functional as F


def _bratu(n=200, lam=3.0):
    h = 1.0 / (n + 1)

    def Fb(u):
        upad = jnp.pad(u, 1)
        lap = (upad[2:] - 2 * u + upad[:-2]) / h**2
        return lap + lam * jnp.exp(u)

    return Fb, n


def test_newton_krylov_bratu_matches_scipy():
    import scipy.optimize

    Fb, n = _bratu()
    r = F.newton_krylov(
        Fb, jnp.zeros(n, jnp.float64), tol=1e-10, inner_maxiter=200
    )
    assert r.status == F.CONVERGED
    assert r.niter <= 6
    xs = scipy.optimize.newton_krylov(
        lambda u: numpy.asarray(Fb(jnp.asarray(u))),
        numpy.zeros(n),
        f_tol=1e-10,
    )
    err = numpy.linalg.norm(numpy.asarray(r.x) - xs)
    assert err <= 1e-8 * numpy.linalg.norm(xs)


def test_newton_krylov_quadratic_convergence():
    """Inexact Newton with Eisenstat-Walker forcing: the residual drop
    accelerates (superlinear tail)."""
    Fb, n = _bratu()
    r = F.newton_krylov(
        Fb, jnp.zeros(n, jnp.float64), tol=1e-10, inner_maxiter=200
    )
    h = r.resnorms
    ratios = h[1:] / h[:-1]
    # each contraction factor beats the previous by 10x in the tail
    assert ratios[-1] < 0.1 * ratios[-2]


def test_newton_krylov_recycling_reduces_inner_work():
    """recycle=3 routes the inner solves through RecyclingGmres with
    params=x (one compilation for the whole sequence); the recycled
    deflation subspace must reduce total inner iterations."""
    Fb, n = _bratu()
    plain = F.newton_krylov(
        Fb, jnp.zeros(n, jnp.float64), tol=1e-10, inner_maxiter=200
    )
    rec = F.newton_krylov(
        Fb, jnp.zeros(n, jnp.float64), tol=1e-10, inner_maxiter=200,
        recycle=3,
    )
    assert rec.status == F.CONVERGED
    assert rec.inner_iters < plain.inner_iters
    # same root
    err = numpy.linalg.norm(numpy.asarray(rec.x - plain.x))
    assert err <= 1e-7 * numpy.linalg.norm(numpy.asarray(plain.x))


def test_newton_krylov_line_search_keeps_iterates_bounded():
    """From a hard start on the steep exponential, PURE Newton diverges
    (residual explodes by orders of magnitude); Armijo backtracking
    keeps the residual bounded below its starting value.  (From a
    moderate bad start both converge -- also checked.)"""
    n = 100
    h = 1.0 / (n + 1)

    def Fb(u):
        upad = jnp.pad(u, 1)
        lap = (upad[2:] - 2 * u + upad[:-2]) / h**2
        return lap + 3.0 * jnp.exp(u)

    # moderate bad start: converges (with default line search)
    r = F.newton_krylov(
        Fb, jnp.full(n, 2.0, jnp.float64), tol=1e-9, maxiter=80,
        inner_maxiter=300,
    )
    assert r.status == F.CONVERGED

    # hard start: pure Newton explodes, line search stays bounded
    x0 = jnp.full(n, 4.0, jnp.float64)
    pure = F.newton_krylov(
        Fb, x0, tol=1e-9, maxiter=40, inner_maxiter=300,
        line_search=False,
    )
    ls = F.newton_krylov(
        Fb, x0, tol=1e-9, maxiter=40, inner_maxiter=300,
    )
    assert pure.resnorms[-1] > 10 * pure.resnorms[0]
    assert ls.resnorms[-1] < ls.resnorms[0]


def test_newton_krylov_budget_honesty():
    Fb, n = _bratu()
    r = F.newton_krylov(
        Fb, jnp.zeros(n, jnp.float64), tol=1e-12, maxiter=1,
        inner_maxiter=5,
    )
    assert r.status == F.MAXITER
    assert bool(jnp.all(jnp.isfinite(r.x)))


def test_newton_krylov_linear_problem_one_step():
    """On a LINEAR F the first Newton step with a tight inner solve is
    the answer."""
    d = jnp.asarray(numpy.linspace(1.0, 10.0, 50))
    b = jnp.asarray(numpy.random.default_rng(0).standard_normal(50))
    Flin = lambda u: d * u - b
    r = F.newton_krylov(
        Flin, jnp.zeros(50, jnp.float64), tol=1e-12, eta_max=1e-12,
        inner_maxiter=60,
    )
    assert r.status == F.CONVERGED
    assert r.niter <= 2
    assert numpy.allclose(numpy.asarray(r.x), numpy.asarray(b / d))
