"""Collective-count contracts on a sharded mesh.

The communication-avoiding claim is structural, so pin it structurally:
count the all-reduce instructions XLA actually emits in the compiled
solver loop body.  On a mesh every all-reduce is an ICI/DCN round trip,
so per-Krylov-iteration all-reduce count is the latency model of the
solver (SURVEY.md section 5.8).
"""

import jax
import jax.numpy as jnp
import pytest

from krypy_tpu import functional as F, ops, parallel

from helpers import loop_body_allreduces


def _max_body_allreduces(jitted, arg, mesh):
    """Steady-state per-iteration sync points: all-reduces of the
    compiled while-loop body (variadic tuple all-reduces count as ONE
    sync point; ENTRY and lax.cond branches excluded)."""
    return loop_body_allreduces(jitted, arg, mesh=mesh)


@pytest.fixture(scope="module")
def mesh_and_problem():
    mesh = parallel.make_mesh(8)
    nx = 64
    lap = ops.poisson_2d(nx)
    b = parallel.shard_vector(jnp.ones(nx * nx, jnp.float32), mesh)
    return mesh, lap, b


def test_ca_gmres_fewer_collectives_per_iteration(mesh_and_problem):
    mesh, lap, b = mesh_and_problem
    s = 4
    with mesh:
        classic = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32, ortho="cgs2")
        )
        ca = jax.jit(
            lambda v: F.ca_gmres(
                lap, v, s=s, basis="newton",
                shifts=[1.0, 2.0, 3.0, 4.0], tol=1e-8, maxiter=32,
            )
        )
    n_classic = _max_body_allreduces(classic, b, mesh)
    n_ca = _max_body_allreduces(ca, b, mesh)
    assert n_classic >= 1 and n_ca >= 1  # sanity: sharded reductions exist
    # measured: classic 3/iter, ca 6 per 4 iters = 1.5/iter
    assert n_ca / s < n_classic, (n_ca, s, n_classic)


def test_gmres_one_reduce_single_collective_per_iteration(mesh_and_problem):
    """ortho='cgs2_1r' communicates exactly ONCE per iteration: the fused
    (m+2, N) x (N, 2) contraction carrying the reorthogonalization pass,
    the Pythagorean norm and the new projection pass lowers to one
    partial-dot + one ICI all-reduce.  cgs2 pays 3 (2 projection passes
    + norm); the explicit-residual verification lives in a lax.cond
    branch outside the steady-state body.  ortho='auto' must resolve to
    the one-reduce scheme under a mesh context."""
    mesh, lap, b = mesh_and_problem
    with mesh:
        classic = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32, ortho="cgs2")
        )
        onered = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32,
                              ortho="cgs2_1r")
        )
        auto = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32, ortho="auto")
        )
    n_classic = _max_body_allreduces(classic, b, mesh)
    assert n_classic >= 3, n_classic
    assert _max_body_allreduces(onered, b, mesh) == 1
    assert _max_body_allreduces(auto, b, mesh) == 1
    with mesh:
        r_onered = onered(b)
        r_auto = auto(b)
        r_classic = classic(b)
    # auto == explicit one-reduce bitwise; both agree with cgs2 to fp
    assert float(jnp.linalg.norm(r_auto.x - r_onered.x)) == 0.0
    assert int(r_onered.niter) == int(r_classic.niter)
    assert float(jnp.linalg.norm(r_onered.x - r_classic.x)) <= 1e-4


def test_cg_one_reduce_single_collective_per_iteration(mesh_and_problem):
    """cg(variant='1r') (Chronopoulos-Gear) communicates exactly ONCE
    per iteration: gamma = <r, u> and delta = <u, A u> come out of one
    stacked (2, N) x (N,) contraction -> one partial-dot + all-reduce;
    the classic recurrence pays 2 (<p, Ap> + the residual norm).
    variant='auto' must resolve to the one-reduce scheme under a mesh
    context, bitwise-identical to the explicit variant."""
    mesh, lap, b = mesh_and_problem
    Mj = ops.jacobi_preconditioner(lap)
    with mesh:
        # tol sits above the fixture's f32 TRUE-residual floor (~2e-4:
        # the explicit-residual verification, not the updated recurrence,
        # decides convergence)
        classic = jax.jit(
            lambda v: F.cg(lap, v, M=Mj, tol=1e-3, maxiter=256)
        )
        onered = jax.jit(
            lambda v: F.cg(lap, v, M=Mj, tol=1e-3, maxiter=256,
                           variant="1r")
        )
        auto = jax.jit(
            lambda v: F.cg(lap, v, M=Mj, tol=1e-3, maxiter=256,
                           variant="auto")
        )
    assert _max_body_allreduces(classic, b, mesh) == 2
    assert _max_body_allreduces(onered, b, mesh) == 1
    assert _max_body_allreduces(auto, b, mesh) == 1
    with mesh:
        r_onered = onered(b)
        r_auto = auto(b)
        r_classic = classic(b)
    assert bool(r_onered.converged) and bool(r_classic.converged)
    assert float(jnp.linalg.norm(r_auto.x - r_onered.x)) == 0.0
    assert float(
        jnp.linalg.norm(r_onered.x - r_classic.x)
        / jnp.linalg.norm(r_classic.x)
    ) <= 1e-2


def test_minres_one_reduce_single_collective_per_iteration(mesh_and_problem):
    """minres(variant='1r') communicates exactly ONCE per iteration:
    nu = ||p||_M^2, alpha = <v, w> and sigma = ||w||_M^2 come out of one
    (2, N) x (N, 2) cross-Gram contraction -> one partial-dot +
    all-reduce; the new subdiagonal follows by the nu-corrected
    Pythagorean identity.  The classic Lanczos step pays 2 (alpha + the
    beta norm).  variant='auto' must resolve to the one-reduce scheme
    under a mesh context, bitwise-identical to the explicit variant."""
    mesh, lap, b = mesh_and_problem
    Mj = ops.jacobi_preconditioner(lap)
    with mesh:
        classic = jax.jit(
            lambda v: F.minres(lap, v, M=Mj, tol=1e-3, maxiter=256)
        )
        onered = jax.jit(
            lambda v: F.minres(lap, v, M=Mj, tol=1e-3, maxiter=256,
                               variant="1r")
        )
        auto = jax.jit(
            lambda v: F.minres(lap, v, M=Mj, tol=1e-3, maxiter=256,
                               variant="auto")
        )
    assert _max_body_allreduces(classic, b, mesh) == 2
    assert _max_body_allreduces(onered, b, mesh) == 1
    assert _max_body_allreduces(auto, b, mesh) == 1
    with mesh:
        r_onered = onered(b)
        r_auto = auto(b)
        r_classic = classic(b)
    assert bool(r_onered.converged) and bool(r_classic.converged)
    assert float(jnp.linalg.norm(r_auto.x - r_onered.x)) == 0.0
    assert float(
        jnp.linalg.norm(r_onered.x - r_classic.x)
        / jnp.linalg.norm(r_classic.x)
    ) <= 1e-2


def test_ca_cg_fewer_collectives_per_iteration(mesh_and_problem):
    mesh, lap, b = mesh_and_problem
    Mj = ops.jacobi_preconditioner(lap)
    s = 4
    with mesh:
        classic = jax.jit(
            lambda v: F.cg(lap, v, M=Mj, tol=1e-8, maxiter=64)
        )
        ca = jax.jit(
            lambda v: F.ca_cg(lap, v, s=s, M=Mj, tol=1e-8, maxiter=64)
        )
    n_classic = _max_body_allreduces(classic, b, mesh)
    n_ca = _max_body_allreduces(ca, b, mesh)
    assert n_classic >= 1 and n_ca >= 1
    assert n_ca / s < n_classic, (n_ca, s, n_classic)


def test_lsqr_two_collectives_per_iteration(mesh_and_problem):
    """The Golub-Kahan step communicates exactly twice (the two vector
    norms); everything else is scalar recurrences.  The explicit
    verification branch adds reductions only on candidate-convergence
    iterations, which live in a lax.cond branch, not the steady-state
    body cost -- but they do appear in the body computation text, so pin
    the ESTIMATE-only variant."""
    mesh, lap, b = mesh_and_problem
    with mesh:
        solve = jax.jit(
            lambda v: F.lsqr(
                lap, v, Ah=lap, tol=1e-6, maxiter=64,
                explicit_residual=False,
            )
        )
    n = _max_body_allreduces(solve, b, mesh)
    assert n == 2, n


def test_polynomial_preconditioner_adds_no_collectives(mesh_and_problem):
    """p(A) is matvecs only: a GMRES iteration with the degree-8
    polynomial as Mr must emit exactly as many all-reduces as a plain
    GMRES iteration (the polynomial roots are baked-in constants)."""
    mesh, lap, b = mesh_and_problem
    P = ops.gmres_polynomial_preconditioner(
        lap, 8, seed=jnp.ones(64 * 64, jnp.float32)
    )
    with mesh:
        plain = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=16, ortho="cgs2")
        )
        poly = jax.jit(
            lambda v: F.gmres(
                lap, v, Mr=P, tol=1e-8, maxiter=16, ortho="cgs2"
            )
        )
    assert _max_body_allreduces(poly, b, mesh) == _max_body_allreduces(
        plain, b, mesh
    )


def test_chebyshev_one_collective_per_check_block(mesh_and_problem):
    """Chebyshev iteration is reduction-free between residual checks:
    the compiled loop body must contain exactly ONE all-reduce (the
    per-block true-residual norm), independent of check_every."""
    mesh, lap, b = mesh_and_problem
    Mj = ops.jacobi_preconditioner(lap)
    with mesh:
        cheb = jax.jit(
            lambda v: F.chebyshev(
                lap, v, M=Mj, lmin=2e-3, lmax=2.0, tol=1e-4,
                maxiter=4096, check_every=64,
            )
        )
    n = _max_body_allreduces(cheb, b, mesh)
    assert n == 1, n


def test_gmres_fused_sharded_parity_and_sync_points(mesh_and_problem):
    """ortho='cgs2_fused' under an active mesh runs the per-shard Pallas
    kernels via shard_map: 3 LOCAL basis sweeps + exactly 2 all-reduces
    (the two coefficient psums, in the bucket-switch branch) + the norm
    reduce in the loop body = 3 sync points/iter, one basis sweep of HBM
    traffic per iteration less than cgs2.  Solution parity vs cgs2."""
    mesh, lap, b = mesh_and_problem
    with mesh:
        fused = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32,
                              ortho="cgs2_fused")
        )
        classic = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32, ortho="cgs2")
        )
    # loop body: the norm reduce only (the psums live in the branch)
    assert loop_body_allreduces(fused, b, mesh=mesh) == 1
    # the per-iteration switch branch: the two coefficient psums
    assert (
        loop_body_allreduces(fused, b, mesh=mesh, include_branches=True)
        == 2
    )
    with mesh:
        r_fused = fused(b)
        r_classic = classic(b)
    assert int(r_fused.niter) == int(r_classic.niter)
    assert float(jnp.linalg.norm(r_fused.x - r_classic.x)) <= 1e-4 * float(
        jnp.linalg.norm(r_classic.x)
    ) + 1e-6


def test_gmres_auto_mesh_regime_policy(mesh_and_problem, monkeypatch):
    """ortho='auto' under a mesh picks by the sweep-vs-sync price model:
    zero sync cost (bandwidth-bound shards) resolves to the sharded
    fused kernel, expensive syncs (latency-bound) to the one-reduce
    scheme -- each bitwise equal to the explicit choice."""
    import sys

    gmod = sys.modules["krypy_tpu.functional.gmres"]
    mesh, lap, b = mesh_and_problem
    with mesh:
        r_fused = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32,
                              ortho="cgs2_fused")
        )(b)
        r_1r = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32,
                              ortho="cgs2_1r")
        )(b)

    monkeypatch.setattr(gmod, "_MESH_SYNC_S", 0.0)
    with mesh:
        r_bw = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32, ortho="auto")
        )(b)
    assert float(jnp.linalg.norm(r_bw.x - r_fused.x)) == 0.0

    monkeypatch.setattr(gmod, "_MESH_SYNC_S", 1.0)
    with mesh:
        r_lat = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-8, maxiter=32, ortho="auto")
        )(b)
    assert float(jnp.linalg.norm(r_lat.x - r_1r.x)) == 0.0
