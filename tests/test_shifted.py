"""Multi-shift GMRES (one Krylov basis, many shifted systems).

The reference solves shifted systems one at a time (no multi-shift
surface); oracles here are per-shift true residuals and single-system
gmres agreement.
"""

import numpy

import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel


def _nonsym(n=300, seed=0):
    rng = numpy.random.default_rng(seed)
    d = numpy.linspace(1.0, 50.0, n)
    S = rng.standard_normal((n, n)) * 0.3 / numpy.sqrt(n)
    A = numpy.diag(d) + S - S.T
    return A, rng.standard_normal(n)


def test_shifted_gmres_reported_equals_true_residual():
    Am, b = _nonsym()
    n = Am.shape[0]
    shifts = numpy.array([0.0, 0.5, 2.0, 10.0])
    r = F.shifted_gmres(
        jnp.asarray(Am), jnp.asarray(b), jnp.asarray(shifts),
        maxiter=120, tol=1e-10,
    )
    assert bool(jnp.all(r.status == F.CONVERGED))
    bn = numpy.linalg.norm(b)
    for i, s in enumerate(shifts):
        true = numpy.linalg.norm(
            b - (Am + s * numpy.eye(n)) @ numpy.asarray(r.X[i])
        ) / bn
        assert true <= 1e-10
        assert abs(true - float(r.resnorms[i])) <= 1e-12


def test_shifted_gmres_matches_single_system_gmres():
    Am, b = _nonsym(200, 1)
    sigma = 3.0
    r = F.shifted_gmres(
        jnp.asarray(Am), jnp.asarray(b), jnp.asarray([sigma]),
        maxiter=100, tol=1e-11,
    )
    single = F.gmres(
        jnp.asarray(Am + sigma * numpy.eye(200)), jnp.asarray(b),
        tol=1e-11, maxiter=100,
    )
    err = numpy.linalg.norm(
        numpy.asarray(r.X[0]) - numpy.asarray(single.x)
    )
    assert err <= 1e-8 * numpy.linalg.norm(numpy.asarray(single.x))


def test_shifted_gmres_complex_conjugate_symmetry():
    """Real operator + conjugate shift pair: the solutions are exact
    conjugates (the small solves promote; the basis stays real)."""
    Am, b = _nonsym(200, 2)
    cs = jnp.asarray([1.0 + 2.0j, 1.0 - 2.0j])
    r = F.shifted_gmres(
        jnp.asarray(Am), jnp.asarray(b), cs, maxiter=100, tol=1e-10
    )
    assert bool(jnp.all(r.status == F.CONVERGED))
    sym = numpy.abs(
        numpy.asarray(r.X[0]).conj() - numpy.asarray(r.X[1])
    ).max()
    assert sym == 0.0


def test_shifted_gmres_per_shift_status_honesty():
    """A hard (nearly singular) shift must report MAXITER while easy
    shifts converge -- per-shift statuses, no collective lie."""
    n = 300
    d = numpy.linspace(1.0, 50.0, n)
    A = jnp.asarray(numpy.diag(d))
    b = jnp.ones(n)
    # shift -0.99999999 makes (A + sigma I) nearly singular at d[0]=1
    shifts = jnp.asarray([0.0, -0.99999999])
    r = F.shifted_gmres(A, b, shifts, maxiter=150, tol=1e-8)
    assert int(r.status[0]) == F.CONVERGED
    assert int(r.status[1]) == F.MAXITER


def test_shifted_gmres_many_shifts_sharded():
    """256 shifts from one basis, sharded over the 8-device mesh."""
    mesh = parallel.make_mesh(8)
    nx = 32
    lap = ops.poisson_2d(nx)
    b = parallel.shard_vector(jnp.ones(nx * nx, jnp.float32), mesh)
    shifts = jnp.linspace(0.0, 100.0, 256)
    with mesh:
        r = jax.jit(
            lambda bb: F.shifted_gmres(
                lap, bb, shifts, maxiter=60, tol=1e-4
            )
        )(b)
    assert bool(jnp.all(r.status == F.CONVERGED))
    assert r.X.shape == (256, nx * nx)


def test_shifted_cg_matches_exact_solutions():
    n = 400
    d = numpy.linspace(1.0, 100.0, n)
    A = ops.diagonal(jnp.asarray(d))
    b = jnp.asarray(numpy.random.default_rng(0).standard_normal(n))
    shifts = numpy.array([0.0, 0.1, 1.0, 10.0, 100.0])
    r = F.shifted_cg(A, b, jnp.asarray(shifts), tol=1e-10, maxiter=500)
    assert bool(jnp.all(r.status == F.CONVERGED))
    for i, s in enumerate(shifts):
        x_exact = numpy.asarray(b) / (d + s)
        err = numpy.linalg.norm(
            numpy.asarray(r.X[i]) - x_exact
        ) / numpy.linalg.norm(x_exact)
        assert err <= 1e-8, (s, err)


def test_shifted_cg_matches_per_shift_cg():
    """Each row of X equals a standalone CG solve of (A + s I) x = b."""
    nx = 24
    lap = ops.poisson_2d(nx)
    b = jnp.ones(nx * nx, jnp.float64)
    shifts = [0.0, 50.0]
    r = F.shifted_cg(lap, b, jnp.asarray(shifts), tol=1e-10,
                     maxiter=2000)
    for i, s in enumerate(shifts):
        single = F.cg(
            lambda v, s=s: lap(v) + s * v, b, tol=1e-10, maxiter=2000
        )
        err = numpy.linalg.norm(
            numpy.asarray(r.X[i]) - numpy.asarray(single.x)
        )
        assert err <= 1e-7 * numpy.linalg.norm(numpy.asarray(single.x))


def test_shifted_cg_true_residual_honesty():
    """Statuses come from explicitly recomputed residuals: an
    unreachable f32 tolerance reports MAXITER."""
    n = 500
    d = numpy.linspace(1e-3, 50.0, n).astype(numpy.float32)
    A = ops.diagonal(jnp.asarray(d))
    b = jnp.ones(n, jnp.float32)
    r = F.shifted_cg(A, b, jnp.asarray([0.0, 1.0]), tol=1e-13,
                     maxiter=1500)
    assert int(r.status[0]) == F.MAXITER
    assert bool(jnp.all(jnp.isfinite(r.X)))


def test_shifted_cg_collective_count_independent_of_shifts():
    """The multi-shift structure: per-iteration all-reduces come from
    the BASE system only (2), regardless of the number of shifts."""
    import re

    mesh = parallel.make_mesh(8)
    nx = 32
    lap = ops.poisson_2d(nx)
    b = parallel.shard_vector(jnp.ones(nx * nx, jnp.float32), mesh)

    def n_body_allreduces(jitted):
        with mesh:
            txt = jitted.lower(b).compile().as_text()
        best = 0
        for comp in re.split(r"\n\n", txt):
            n = len(
                re.findall(r"= \S+ all-reduce\(|all-reduce-start", comp)
            )
            best = max(best, n)
        return best

    few = jax.jit(
        lambda v: F.shifted_cg(lap, v, jnp.zeros(2), tol=1e-6,
                               maxiter=64)
    )
    many = jax.jit(
        lambda v: F.shifted_cg(lap, v, jnp.linspace(0.0, 9.0, 64),
                               tol=1e-6, maxiter=64)
    )
    assert n_body_allreduces(few) == n_body_allreduces(many)


def test_shifted_cg_one_reduce_matches_classic_and_pins_hlo():
    """variant='1r' (Chronopoulos-Gear seed recurrence): the ENTIRE
    multi-mass family costs ONE all-reduce per iteration (classic: 2),
    same iterates to fp; variant='auto' resolves to it under a mesh,
    bitwise-identical."""
    from helpers import loop_body_allreduces

    lap = ops.poisson_2d(48)
    b = jnp.ones(48 * 48, jnp.float64)
    sh = jnp.asarray([0.0, 0.5, 2.0, 10.0])
    rc = F.shifted_cg(lap, b, sh, tol=1e-10, maxiter=3000)
    r1 = F.shifted_cg(lap, b, sh, tol=1e-10, maxiter=3000, variant="1r")
    assert int(r1.niter) == int(rc.niter)
    assert numpy.asarray(r1.status).tolist() == [F.CONVERGED] * 4
    assert float(jnp.max(jnp.abs(rc.X - r1.X))) <= 1e-12

    mesh = parallel.make_mesh(8)
    lap2 = ops.poisson_2d(64)
    bs = parallel.shard_vector(jnp.ones(64 * 64, jnp.float32), mesh)
    fc = jax.jit(
        lambda v: F.shifted_cg(lap2, v, sh, tol=1e-4, maxiter=300)
    )
    f1 = jax.jit(
        lambda v: F.shifted_cg(lap2, v, sh, tol=1e-4, maxiter=300,
                               variant="1r")
    )
    fa = jax.jit(
        lambda v: F.shifted_cg(lap2, v, sh, tol=1e-4, maxiter=300,
                               variant="auto")
    )
    assert loop_body_allreduces(fc, bs, mesh=mesh) == 2
    assert loop_body_allreduces(f1, bs, mesh=mesh) == 1
    assert loop_body_allreduces(fa, bs, mesh=mesh) == 1
    with mesh:
        ra, rb = fa(bs), f1(bs)
    assert float(jnp.linalg.norm(ra.X - rb.X)) == 0.0
    import pytest

    with pytest.raises(ValueError, match="variant"):
        F.shifted_cg(lap, b, sh, variant="bogus")


def test_shifted_cg_f32_divergence_guard_returns_best():
    """f32 family pushed far past the attainable floor: the seed
    stagnation guard must return the BEST-seed snapshot (finite, near
    the floor), never a diverged final iterate (code-review finding)."""
    n = 2000
    d = numpy.linspace(1e-2, 1e4, n).astype(numpy.float32)
    A = ops.diagonal(jnp.asarray(d))
    b = jnp.ones(n, jnp.float32)
    r = F.shifted_cg(A, b, jnp.asarray([0.0, 1.0]), tol=1e-12,
                     maxiter=n)
    assert bool(jnp.all(jnp.isfinite(r.X)))
    # the returned iterates sit near the f32 floor, not at divergence
    assert float(jnp.max(r.resnorms)) < 1e-2
    assert int(r.status[0]) == F.MAXITER  # honest: tol unreachable


def test_restarted_shifted_gmres_converges_where_single_cycle_cannot():
    """Seed-system restarts: m=25 cycles reach 1e-8 where one m=25
    cycle stalls; residuals stay collinear by construction, statuses
    come from explicit true residuals."""
    Am, b = _nonsym(n=300, seed=3)
    shifts = numpy.array([0.0, 0.5, 2.0, 10.0])
    one = F.shifted_gmres(
        jnp.asarray(Am), jnp.asarray(b), jnp.asarray(shifts),
        maxiter=25, tol=1e-8,
    )
    assert not bool(one.converged.all())  # single cycle insufficient
    r = F.restarted_shifted_gmres(
        jnp.asarray(Am), jnp.asarray(b), jnp.asarray(shifts),
        maxiter=25, max_restarts=12, tol=1e-8,
    )
    assert bool(r.converged.all()), numpy.asarray(r.resnorms)
    # explicit per-shift residual check against the reported ones
    for i, s in enumerate(shifts):
        x = numpy.asarray(r.X[i])
        rel = numpy.linalg.norm(b - (Am @ x + s * x)) / numpy.linalg.norm(b)
        assert rel <= 1.1e-8
        assert abs(rel - float(r.resnorms[i])) <= 1e-10


def test_restarted_shifted_gmres_matches_per_shift_restarted_gmres():
    """Each shift's solution agrees with independently restarted GMRES
    on that single system (same m), to the shared tolerance."""
    from krypy_tpu.functional.gmres import restarted_gmres

    Am, b = _nonsym(n=200, seed=4)
    shifts = numpy.array([0.1, 1.0, 5.0])
    r = F.restarted_shifted_gmres(
        jnp.asarray(Am), jnp.asarray(b), jnp.asarray(shifts),
        maxiter=20, max_restarts=15, tol=1e-9,
    )
    assert bool(r.converged.all())
    for i, s in enumerate(shifts):
        ref = restarted_gmres(
            jnp.asarray(Am + s * numpy.eye(200)), jnp.asarray(b),
            maxiter=20, max_restarts=25, tol=1e-9,
        )
        assert numpy.allclose(
            numpy.asarray(r.X[i]), numpy.asarray(ref.x),
            rtol=1e-6, atol=1e-8,
        )


def test_restarted_shifted_gmres_complex_shifts_and_seed():
    """Complex shifts promote the direction after cycle 1; a non-zero
    seed index works and bad seed indices raise."""
    import pytest

    Am, b = _nonsym(n=150, seed=5)
    shifts = numpy.array([0.5 + 0.3j, 2.0 - 1.0j, 4.0])
    r = F.restarted_shifted_gmres(
        jnp.asarray(Am), jnp.asarray(b), jnp.asarray(shifts),
        maxiter=20, max_restarts=15, tol=1e-8, seed=1,
    )
    assert bool(r.converged.all()), numpy.asarray(r.resnorms)
    for i, s in enumerate(shifts):
        x = numpy.asarray(r.X[i])
        rel = numpy.linalg.norm(b - (Am @ x + s * x)) / numpy.linalg.norm(b)
        assert rel <= 1.1e-8
    with pytest.raises(ValueError, match="seed"):
        F.restarted_shifted_gmres(
            jnp.asarray(Am), jnp.asarray(b), jnp.asarray(shifts), seed=7
        )


def test_restarted_shifted_gmres_happy_breakdown():
    """Eigenvector rhs (Krylov grade 1): the seed solves exactly in one
    step, z = 0 makes the augmented system singular -- the plain-LSQ
    fallback must return the EXACT solutions for every shift instead of
    NaN (the invariant space contains all of them)."""
    A = jnp.diag(jnp.arange(1.0, 9.0))
    b = jnp.zeros(8).at[2].set(1.0)
    r = F.restarted_shifted_gmres(
        A, b, jnp.asarray([0.0, 1.0]), maxiter=6, max_restarts=5,
        tol=1e-10,
    )
    assert bool(r.converged.all()), numpy.asarray(r.resnorms)
    assert numpy.all(numpy.isfinite(numpy.asarray(r.X)))
    numpy.testing.assert_allclose(
        numpy.asarray(r.X[0]), numpy.asarray(b) / 3.0, atol=1e-12
    )
    numpy.testing.assert_allclose(
        numpy.asarray(r.X[1]), numpy.asarray(b) / 4.0, atol=1e-12
    )


def test_restarted_shifted_gmres_easy_seed_hard_family():
    """An EASY seed converging to eps within cycle 1 forces the plain
    fallback and breaks collinearity; the rescue pass must still finish
    the hard shift (review finding: it previously stalled at 6.6e-4
    with the implied factors under-reporting convergence)."""
    rng = numpy.random.default_rng(0)
    n = 300
    d = numpy.linspace(1.0, 50.0, n)
    S = rng.standard_normal((n, n)) * 0.3 / numpy.sqrt(n)
    A = jnp.asarray(numpy.diag(d) + S - S.T)
    b = jnp.asarray(rng.standard_normal(n))
    r = F.restarted_shifted_gmres(
        A, b, jnp.asarray([1000.0, 0.0]), maxiter=25, max_restarts=40,
        tol=1e-8,
    )
    assert bool(r.converged.all()), numpy.asarray(r.resnorms)
    for i, sg in enumerate([1000.0, 0.0]):
        x = numpy.asarray(r.X[i])
        rel = numpy.linalg.norm(
            numpy.asarray(b) - (numpy.asarray(A) @ x + sg * x)
        ) / numpy.linalg.norm(numpy.asarray(b))
        assert rel <= 1.1e-8
