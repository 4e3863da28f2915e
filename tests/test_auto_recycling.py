"""Automatic deflation-subspace selection (functional lane).

Covers the AutoRecyclingGmres driver: priced greedy width selection
(reference analog: krypy/recycling/factories.py:52-107 +
evaluators.py:13-134), timing-model feedback, nonhermitian fallback, and
the NLS Newton sequence of BASELINE config 5.
"""

import numpy

import jax.numpy as jnp

from krypy_tpu import functional as F, ops


def _outlier_sequence(n=300, n_sys=5, n_outliers=4):
    base = numpy.linspace(1, 2, n)
    base[:n_outliers] = numpy.logspace(-4, -1.7, n_outliers)
    return [
        ops.diagonal(jnp.asarray(base * (1 + 0.01 * i), jnp.float32))
        for i in range(n_sys)
    ], jnp.ones(n, jnp.float32)


def test_auto_selects_outlier_width_and_beats_fixed_iterations():
    """With 4 planted outliers the priced selection should pick a width
    that removes them, and the recycled solves should need no more
    iterations than a narrower fixed selection."""
    seq, b = _outlier_sequence()
    n = b.shape[0]

    auto = F.AutoRecyclingGmres(max_vectors=4, hermitian=True)
    fixed = F.RecyclingGmres(n_vectors=2, which="sm", hermitian=True)
    auto.warmup(seq[0], b, tol=1e-4, maxiter=n)
    fixed.warmup(seq[0], b, tol=1e-4, maxiter=n)

    auto_iters, fixed_iters = [], []
    for op in seq:
        auto_iters.append(int(auto.solve(op, b, tol=1e-4, maxiter=n).niter))
        fixed_iters.append(
            int(fixed.solve(op, b, tol=1e-4, maxiter=n).niter)
        )

    # solve 1 has no Ritz data: plain for both
    assert auto.selected_widths[0] == 0
    # afterwards the selection must engage (width > 0) and the recycled
    # solves improve on the cold one
    assert all(w > 0 for w in auto.selected_widths[1:])
    assert min(auto_iters[1:]) < auto_iters[0]
    # 4 outliers: width-4 deflation dominates width-2
    assert sum(auto_iters[1:]) <= sum(fixed_iters[1:])


def test_auto_restricted_widths():
    """widths= restricts the candidate set (fewer compiled cores for
    serving); selections stay within it, 0 and max always included."""
    seq, b = _outlier_sequence()
    n = b.shape[0]
    auto = F.AutoRecyclingGmres(max_vectors=4, hermitian=True,
                                widths=(0, 4))
    assert auto._widths == (0, 4)
    auto.warmup(seq[0], b, tol=1e-4, maxiter=n)
    iters = [
        int(auto.solve(op, b, tol=1e-4, maxiter=n).niter) for op in seq
    ]
    assert all(w in (0, 4) for w in auto.selected_widths)
    assert any(w == 4 for w in auto.selected_widths[1:])
    assert min(iters[1:]) < iters[0]
    with numpy.testing.assert_raises(ValueError):
        F.AutoRecyclingGmres(max_vectors=3, widths=(0, 7))


def test_auto_predictions_track_actual_iterations():
    """The a-priori bound pricing should predict the recycled iteration
    counts to within a small factor (it is a BOUND, so it may only
    overestimate moderately, never wildly undershoot)."""
    seq, b = _outlier_sequence()
    n = b.shape[0]
    auto = F.AutoRecyclingGmres(max_vectors=4, hermitian=True)
    auto.warmup(seq[0], b, tol=1e-4, maxiter=n)
    iters = [
        int(auto.solve(op, b, tol=1e-4, maxiter=n).niter) for op in seq
    ]
    for pred, actual in zip(auto.predicted_steps[1:], iters[1:]):
        assert pred is not None
        assert actual <= 3 * pred + 5
        assert pred <= 10 * actual + 5


def test_auto_timing_model_updates():
    seq, b = _outlier_sequence(n_sys=3)
    n = b.shape[0]
    auto = F.AutoRecyclingGmres(max_vectors=3, hermitian=True)
    auto.warmup(seq[0], b, tol=1e-4, maxiter=n)
    for op in seq:
        auto.solve(op, b, tol=1e-4, maxiter=n)
    # tau measured for the plain solve and for the selected width
    assert 0 in auto._tau
    assert any(w in auto._tau for w in auto.selected_widths[1:])
    assert all(t > 0 for t in auto._tau.values())


def test_auto_nonhermitian_falls_back_to_fixed_width():
    """Complex Ritz values make every a-priori candidate unevaluable;
    the driver must fall back to the fixed-width extraction rather than
    fail (reference: AssumptionError-as-control-flow)."""
    n = 200
    rng = numpy.random.default_rng(3)
    # strongly nonsymmetric: convection-diffusion
    op = ops.convection_diffusion_2d(14, 14, wind=(8.0, 4.0), eps=0.05)
    n = 14 * 14
    b = jnp.asarray(rng.standard_normal(n).astype(numpy.float32))
    auto = F.AutoRecyclingGmres(max_vectors=3, hermitian=False)
    r1 = auto.solve(op, b, tol=1e-5, maxiter=n)
    r2 = auto.solve(op, b, tol=1e-5, maxiter=n)
    assert bool(r1.converged)
    # fallback marks the fixed width
    assert auto.selected_widths[0] == 0
    assert auto.selected_widths[1] in (0, 3)
    # solve 2 may sit at the f32 deflated-correction floor; require a
    # sound iterate rather than the formal flag
    err = float(jnp.linalg.norm(op(r2.x) - b) / jnp.linalg.norm(b))
    assert err <= 1e-3


def test_nls_residual_manufactured_solution():
    func, ustar = ops.nls_residual_2d(16, kappa=1.0, lam=25.0)
    res = float(jnp.linalg.norm(func(ustar)))
    assert res <= 1e-3  # f32 roundoff on O(h^-2) terms


def test_newton_nls_recycled_sequence_decays():
    """BASELINE config 5 in miniature: Newton on the NLS residual with
    recycled Jacobian solves; per-step histories must be recorded and
    the recycled tail must not exceed the first recycled solve."""
    func, ustar = ops.nls_residual_2d(16, kappa=1.0, lam=25.0)
    x0 = jnp.zeros(256, jnp.float32)
    rec = F.RecyclingGmres(n_vectors=3, which="sm", hermitian=True)
    res = F.newton_krylov(
        func, x0, tol=1e-6, maxiter=15, inner_maxiter=200,
        recycling_solver=rec, warmup=True,
    )
    assert res.converged
    assert res.inner_history.shape[0] == res.niter
    assert res.inner_walls.shape[0] == res.niter
    # the solution is the manufactured bump (or another root; accept any
    # true root)
    assert float(jnp.linalg.norm(func(res.x))) <= 1e-3 * max(
        1.0, float(jnp.linalg.norm(func(x0)))
    )
    # Eisenstat-Walker oversolve guard: no step may burn the full budget
    assert max(res.inner_history) < 200


def test_newton_auto_recycling_integration():
    func, ustar = ops.nls_residual_2d(16, kappa=1.0, lam=25.0)
    x0 = jnp.zeros(256, jnp.float32)
    auto = F.AutoRecyclingGmres(max_vectors=3, hermitian=True)
    res = F.newton_krylov(
        func, x0, tol=1e-6, maxiter=15, inner_maxiter=200,
        recycling_solver=auto, warmup=True,
    )
    assert res.converged
    assert len(auto.selected_widths) == res.niter
