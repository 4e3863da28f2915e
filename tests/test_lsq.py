"""LSQR/LSMR least-squares solvers (Golub-Kahan bidiagonalization).

Oracles are dense ``numpy.linalg.lstsq`` solutions; the reference
framework has no least-squares surface (krypy requires square systems,
krypy/linsys.py:38-123), so these pins are framework-native.
"""

import numpy
import pytest

import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, parallel


def _overdetermined(seed=0, mrows=300, ncols=120, noise=0.01):
    rng = numpy.random.default_rng(seed)
    A = rng.standard_normal((mrows, ncols))
    x = rng.standard_normal(ncols)
    b = A @ x + noise * rng.standard_normal(mrows)
    return A, b


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_overdetermined_matches_lstsq(solver):
    A, b = _overdetermined()
    xref, *_ = numpy.linalg.lstsq(A, b, rcond=None)
    r = solver(jnp.asarray(A), jnp.asarray(b), tol=1e-12, maxiter=400)
    assert int(r.status) == 0
    err = numpy.linalg.norm(numpy.asarray(r.x) - xref)
    assert err <= 1e-8 * numpy.linalg.norm(xref)


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_damped_matches_augmented_lstsq(solver):
    """damp=0.5 equals the explicitly augmented [A; damp I] problem."""
    A, b = _overdetermined()
    damp = 0.5
    Aaug = numpy.vstack([A, damp * numpy.eye(A.shape[1])])
    baug = numpy.r_[b, numpy.zeros(A.shape[1])]
    xref, *_ = numpy.linalg.lstsq(Aaug, baug, rcond=None)
    r = solver(jnp.asarray(A), jnp.asarray(b), damp=damp, tol=1e-12,
               maxiter=400)
    assert int(r.status) == 0
    err = numpy.linalg.norm(numpy.asarray(r.x) - xref)
    assert err <= 1e-8 * numpy.linalg.norm(xref)


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_consistent_square_resnorms_track_truth(solver):
    """On a consistent system the residual-norm ESTIMATE must agree with
    the true residual history (exact in exact arithmetic)."""
    d = numpy.linspace(1.0, 30.0, 200)
    rng = numpy.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(200))
    Aop = lambda v: jnp.asarray(d) * v
    r = solver(Aop, b, Ah=Aop, tol=1e-12, maxiter=300)
    assert int(r.status) == 0
    true_rel = float(jnp.linalg.norm(b - Aop(r.x)) / jnp.linalg.norm(b))
    assert true_rel <= 1e-10
    est = float(numpy.asarray(r.resnorms)[int(r.niter)])
    assert abs(est - true_rel) <= 1e-9


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_underdetermined_minimum_norm(solver):
    """x0=0 yields the minimum-norm solution of a consistent
    underdetermined system (the iterates stay in range(A^H))."""
    rng = numpy.random.default_rng(2)
    A = rng.standard_normal((60, 150))
    b = rng.standard_normal(60)
    xref, *_ = numpy.linalg.lstsq(A, b, rcond=None)  # minimum-norm
    r = solver(jnp.asarray(A), jnp.asarray(b), tol=1e-13, maxiter=400)
    err = numpy.linalg.norm(numpy.asarray(r.x) - xref)
    assert err <= 1e-7 * numpy.linalg.norm(xref)


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_complex(solver):
    rng = numpy.random.default_rng(3)
    A = rng.standard_normal((80, 40)) + 1j * rng.standard_normal((80, 40))
    b = rng.standard_normal(80) + 1j * rng.standard_normal(80)
    xref, *_ = numpy.linalg.lstsq(A, b, rcond=None)
    r = solver(jnp.asarray(A), jnp.asarray(b), tol=1e-12, maxiter=300)
    err = numpy.linalg.norm(numpy.asarray(r.x) - xref)
    assert err <= 1e-8 * numpy.linalg.norm(xref)


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_zero_rhs(solver):
    A = jnp.eye(16)
    r = solver(A, jnp.zeros(16), tol=1e-12)
    assert int(r.status) == 0
    assert int(r.niter) == 0
    assert float(jnp.linalg.norm(r.x)) == 0.0


def test_lsq_callable_requires_Ah():
    with pytest.raises(ValueError, match="Ah"):
        F.lsqr(lambda v: v, jnp.ones(8))
    with pytest.raises(ValueError, match="Ah"):
        F.lsmr(lambda v: v, jnp.ones(8))


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_jit_and_sharded(solver):
    """The solve jits whole and the N axis shards over the mesh (the
    only collectives are the two norms per iteration)."""
    mesh = parallel.make_mesh(8)
    d = numpy.linspace(1.0, 10.0, 1024).astype(numpy.float32)
    dj = jnp.asarray(d)
    Aop = lambda v: dj.astype(v.dtype) * v
    b = parallel.shard_vector(jnp.ones(1024, jnp.float32), mesh)
    with mesh:
        r = jax.jit(
            lambda bb: solver(Aop, bb, Ah=Aop, tol=1e-5, maxiter=200)
        )(b)
    assert int(r.status) == 0
    assert len({s.device for s in r.x.addressable_shards}) == 8
    true_rel = float(
        jnp.linalg.norm(b - Aop(r.x)) / jnp.linalg.norm(b)
    )
    assert true_rel <= 1e-4


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_f32_floor_honesty(solver):
    """A below-floor tolerance must not report false convergence; the
    stagnation guard returns MAXITER with a finite iterate."""
    rng = numpy.random.default_rng(4)
    A = rng.standard_normal((200, 100)).astype(numpy.float32)
    b = rng.standard_normal(200).astype(numpy.float32)
    r = solver(jnp.asarray(A), jnp.asarray(b), tol=1e-14, btol=1e-14,
               maxiter=2000, stagnation_window=30)
    assert int(r.status) != 0
    assert bool(jnp.all(jnp.isfinite(r.x)))


def test_lsq_damp_with_x0_centered_objective():
    """damp + x0: the minimized objective is ||b-Ax||^2 +
    damp^2||x-x0||^2 (x0-centered -- code-review finding: the explicit
    verification previously tested the wrong gradient and could never
    pass)."""
    rng = numpy.random.default_rng(11)
    A = rng.standard_normal((200, 80))
    b = rng.standard_normal(200)
    x0 = rng.standard_normal(80)
    damp = 0.5
    # oracle: augmented lstsq of min ||b-Ax||^2 + damp^2 ||x-x0||^2
    Aaug = numpy.vstack([A, damp * numpy.eye(80)])
    baug = numpy.r_[b, damp * x0]
    xref, *_ = numpy.linalg.lstsq(Aaug, baug, rcond=None)
    for solver in (F.lsqr, F.lsmr):
        r = solver(jnp.asarray(A), jnp.asarray(b), damp=damp,
                   x0=jnp.asarray(x0), tol=1e-12, maxiter=400)
        assert int(r.status) == 0, solver.__name__
        err = numpy.linalg.norm(numpy.asarray(r.x) - xref)
        assert err <= 1e-7 * numpy.linalg.norm(xref), solver.__name__


def test_lsq_rectangular_shaped_callable_without_x0():
    """A callable operator exposing .shape (LinearOperator style) must
    get its x dimension from shape[1], not fall back to square
    (code-review finding: crashed with a dimension mismatch)."""
    rng = numpy.random.default_rng(12)
    Am = rng.standard_normal((120, 50))

    class ShapedOp:
        shape = (120, 50)

        def __call__(self, v):
            return jnp.asarray(Am) @ v

    Ah = lambda y: jnp.asarray(Am).T @ y
    b = rng.standard_normal(120)
    xref, *_ = numpy.linalg.lstsq(Am, b, rcond=None)
    for solver in (F.lsqr, F.lsmr):
        r = solver(ShapedOp(), jnp.asarray(b), Ah=Ah, tol=1e-12,
                   maxiter=300)
        err = numpy.linalg.norm(numpy.asarray(r.x) - xref)
        assert err <= 1e-7 * numpy.linalg.norm(xref), solver.__name__


@pytest.mark.parametrize("solver", [F.lsqr, F.lsmr])
def test_lsq_singular_symmetric_pseudoinverse(solver):
    """Singular SYMMETRIC systems (the MINRES-QLP use case): with
    x0=0, lsqr/lsmr return the pseudoinverse solution pinv(A) b for
    both consistent and INCONSISTENT right-hand sides -- plain MINRES
    returns *a* least-squares solution but not the minimum-length one
    when b has a null-space component."""
    rng = numpy.random.default_rng(7)
    n, rank = 80, 50
    Q = numpy.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = numpy.r_[numpy.linspace(5, 1, rank), numpy.zeros(n - rank)]
    A = (Q * lam) @ Q.T
    A = 0.5 * (A + A.T)
    xref_pinv = numpy.linalg.pinv(A, hermitian=True)

    # consistent: b in range(A)
    b_cons = A @ rng.standard_normal(n)
    r = solver(jnp.asarray(A), jnp.asarray(b_cons), tol=1e-13,
               maxiter=600)
    xr = xref_pinv @ b_cons
    err = numpy.linalg.norm(numpy.asarray(r.x) - xr)
    assert err <= 1e-6 * numpy.linalg.norm(xr)

    # inconsistent: b with a null-space component
    b_inc = b_cons + Q[:, rank + 1] * numpy.linalg.norm(b_cons)
    r = solver(jnp.asarray(A), jnp.asarray(b_inc), tol=1e-13,
               maxiter=600)
    xr = xref_pinv @ b_inc
    err = numpy.linalg.norm(numpy.asarray(r.x) - xr)
    assert err <= 1e-6 * numpy.linalg.norm(xr)
