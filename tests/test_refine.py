"""Mixed-precision iterative refinement (functional.refine_to)."""

import numpy
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops


def _poisson_problem(nx=63):
    lap = ops.poisson_2d(nx)
    Mg = ops.multigrid_poisson_preconditioner(nx, coarsest=7)
    b = jnp.ones(nx * nx)
    return lap, Mg, b


def test_refine_reaches_f64_tolerance_from_f32_inner():
    lap, Mg, b = _poisson_problem()
    inner = jax.jit(
        lambda r: F.cg(lap, r, M=Mg, tol=1e-4, maxiter=30,
                       stagnation_window=5)
    )
    res, info = F.refine_to(lap, b, inner, tol=1e-10)
    assert bool(res.converged)
    rel = float(
        jnp.linalg.norm(b - lap(res.x.astype(jnp.float64)))
        / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10
    assert info["cycles"] >= 1
    assert info["inner_iters"] > 0
    # per-cycle history is monotone down to convergence
    outer = numpy.asarray(res.resnorms)
    assert (numpy.diff(outer) < 0).all()


def test_refine_stops_on_stagnation_and_returns_best():
    """An inner 'solver' that stops helping must not loop forever, and
    the BEST iterate (not the last) is returned."""
    lap, Mg, b = _poisson_problem(31)

    calls = {"n": 0}

    def flaky_inner(r):
        calls["n"] += 1
        if calls["n"] == 1:
            return F.cg(lap, r, M=Mg, tol=1e-3, maxiter=20)
        # afterwards: return garbage corrections
        return F.cg(lap, r, M=Mg, tol=1e-3, maxiter=20)._replace(
            x=jnp.full_like(r, 1e3)
        )

    res, info = F.refine_to(lap, b, flaky_inner, tol=1e-14,
                            max_cycles=10)
    assert not bool(res.converged)
    # the garbage cycle must not be the returned iterate
    rel = float(
        jnp.linalg.norm(b - lap(res.x.astype(jnp.float64)))
        / jnp.linalg.norm(b)
    )
    assert rel < 1e-2
    assert calls["n"] <= 3  # stagnation detected immediately


def test_refine_with_x0():
    lap, Mg, b = _poisson_problem(31)
    inner = jax.jit(lambda r: F.cg(lap, r, M=Mg, tol=1e-4, maxiter=30))
    # start from a partially converged iterate
    x0 = F.cg(lap, b, M=Mg, tol=1e-2, maxiter=30).x
    res, info = F.refine_to(lap, b, inner, tol=1e-10, x0=x0)
    assert bool(res.converged)
    assert float(res.resnorms[0]) < 1e-1  # started warm


def test_refine_to_compiled_matches_eager():
    """compiled=True (whole refinement in one while_loop) reproduces the
    eager path: same cycle count, same residual history to rounding,
    same iterate."""
    import numpy

    nx = 63
    lap = ops.poisson_2d(nx)
    Mg = ops.multigrid_poisson_preconditioner(nx, coarsest=7)
    inner = jax.jit(
        lambda r: F.cg(lap, r, M=Mg, tol=1e-4, maxiter=12,
                       stagnation_window=4)
    )
    b = jnp.ones(nx * nx, jnp.float64)
    re_, ie = F.refine_to(lap, b, inner, tol=1e-10)
    rc, ic = F.refine_to(lap, b, inner, tol=1e-10, compiled=True)
    assert ic["cycles"] == ie["cycles"]
    assert ic["inner_iters"] == ie["inner_iters"]
    he = numpy.asarray(re_.resnorms)
    hc = numpy.asarray(rc.resnorms)
    assert numpy.allclose(he, hc, rtol=1e-6)
    assert int(rc.status) == int(re_.status) == 0
    assert float(jnp.linalg.norm(re_.x - rc.x)) <= 1e-10


def test_refine_to_compiled_stagnation_stop():
    """A do-nothing inner solver must stop after one non-improving
    cycle and report MAXITER, exactly like the eager path."""
    nx = 16
    lap = ops.poisson_2d(nx)
    b = jnp.ones(nx * nx, jnp.float64)

    def useless(r):
        from krypy_tpu.functional.common import SolveResult
        return SolveResult(
            x=jnp.zeros_like(r), resnorms=jnp.zeros(1),
            niter=jnp.asarray(1), status=jnp.asarray(1),
        )

    rc, ic = F.refine_to(lap, b, useless, tol=1e-10, compiled=True)
    assert int(rc.status) != 0
    assert ic["cycles"] <= 1


def test_restarted_gmres_compiled_matches_host_and_composes():
    """restarted_gmres(compiled=True) traces the restart loop: it must
    match the host driver's iterate and compose with
    refine_to(compiled=True) into one whole-solve program (the suite
    config-3 path; a host loop inside the traced refinement is a
    ConcretizationTypeError)."""
    import jax.numpy as jnp
    import numpy

    from krypy_tpu import functional as F, ops
    from krypy_tpu.functional.gmres import restarted_gmres

    cd = ops.convection_diffusion_2d(32)
    Ml = ops.jacobi_preconditioner(cd)
    b = jnp.ones(32 * 32, jnp.float32)
    rh = restarted_gmres(cd, b, Ml=Ml, tol=1e-6, maxiter=25,
                         max_restarts=6)
    rt = restarted_gmres(cd, b, Ml=Ml, tol=1e-6, maxiter=25,
                         max_restarts=6, compiled=True)
    assert int(rh.status) == int(rt.status)
    numpy.testing.assert_allclose(
        numpy.asarray(rh.x), numpy.asarray(rt.x), rtol=1e-5
    )
    # resnorms[0] carries the initial relative residual (host contract)
    assert numpy.isclose(
        float(rt.resnorms[0]), float(rh.resnorms[0]), rtol=1e-6
    )
    # per-cycle residuals are recorded and decreasing
    rels = numpy.asarray(rt.resnorms)
    rels = rels[~numpy.isnan(rels)]
    assert rels[-1] < rels[0]

    b64 = jnp.ones(32 * 32, jnp.float64)
    inner = lambda rr: restarted_gmres(
        cd, rr, Ml=Ml, tol=1e-4, maxiter=25, max_restarts=6,
        compiled=True,
    )
    res, info = F.refine_to(cd, b64, inner, tol=1e-8, compiled=True)
    assert bool(res.converged)
    assert float(numpy.nanmin(numpy.asarray(res.resnorms))) <= 1e-8
