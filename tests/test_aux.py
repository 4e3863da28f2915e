"""Tests for auxiliary subsystems: timers/TimedLinearSystem (SURVEY §5.1),
bound_pseudo pseudospectral modes, subset generators/evaluators,
norm_MMlr, estimate_time, debug sanitizers."""

import numpy
import pytest
import jax.numpy as jnp
from numpy.testing import assert_almost_equal

from krypy_tpu import deflation, linsys, recycling, utils
from krypy_tpu.errors import AssumptionError, ConvergenceError

import helpers


def test_timer_and_timings():
    t = utils.Timer()
    with t:
        pass
    with t:
        pass
    assert len(t) == 2
    assert all(v >= 0 for v in t)

    tm = utils.Timings()
    with tm["matvec"]:
        pass
    with tm["matvec"]:
        pass
    with tm["ip"]:
        pass
    assert tm.get("matvec") == min(tm["matvec"])
    assert tm.get("absent") == 0
    total = tm.get_ops({"matvec": 10, "ip": 2})
    assert total == 10 * tm.get("matvec") + 2 * tm.get("ip")
    assert "matvec" in repr(tm)


def test_timed_linear_system_records():
    A = helpers.matrix_spd()
    b = numpy.ones((10, 1))
    ls = linsys.TimedLinearSystem(
        A, b, self_adjoint=True, positive_definite=True
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        linsys.Cg(ls, tol=1e-10)
    assert len(ls.timings["A"]) > 0
    assert ls.timings.get("A") >= 0

    ls2 = linsys.ConvertedTimedLinearSystem(
        linsys.LinearSystem(
            A, b, self_adjoint=True, positive_definite=True
        )
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        linsys.Cg(ls2, tol=1e-10)
    assert len(ls2.timings["A"]) > 0


def test_estimate_time_needs_timed_system():
    A = helpers.matrix_spd()
    b = numpy.ones((10, 1))
    ls = linsys.LinearSystem(
        A, b, self_adjoint=True, positive_definite=True
    )
    sol = deflation.DeflatedCg(
        ls, U=numpy.eye(10, 1), tol=1e-10, store_arnoldi=True
    )
    from krypy_tpu.errors import RuntimeError as KrypyRuntimeError

    with pytest.raises(KrypyRuntimeError):
        sol.estimate_time(5, 1)

    tls = linsys.ConvertedTimedLinearSystem(ls)
    sol = deflation.DeflatedCg(
        tls, U=numpy.eye(10, 1), tol=1e-10, store_arnoldi=True
    )
    t = sol.estimate_time(5, 1)
    assert t >= 0


def test_norm_mmlr():
    A = helpers.matrix_spd()
    x0 = numpy.zeros((10, 1))
    b = numpy.ones((10, 1))
    Aop = utils.get_linearoperator((10, 10), A)
    I = utils.IdentityLinearOperator((10, 10))
    yk = jnp.ones((10, 1)) * 0.1
    xk, Mlr, MMlr, nrm = utils.norm_MMlr(
        I, I, Aop, I, jnp.asarray(b), jnp.asarray(x0), yk
    )
    expected = numpy.linalg.norm(b - A @ (x0 + 0.1 * numpy.ones((10, 1))))
    assert_almost_equal(float(nrm), expected, decimal=12)


def test_orthonormality_measure():
    Q, _ = numpy.linalg.qr(numpy.random.RandomState(0).randn(10, 4))
    assert float(utils.orthonormality(jnp.asarray(Q))) < 1e-14
    assert float(utils.orthonormality(jnp.asarray(Q * 2.0))) > 1


@pytest.mark.parametrize("mode", ["extrapolate", "direct"])
def test_ritz_approx_krylov_evaluator(mode):
    """RitzApproxKrylov end to end, including the Arnoldifyer cache."""
    N = 30
    d = numpy.linspace(1, 2, N)
    d[0] = 1e-3
    ls = linsys.ConvertedTimedLinearSystem(
        linsys.LinearSystem(
            numpy.diag(d),
            numpy.ones((N, 1)),
            normal=True,
            self_adjoint=True,
            positive_definite=True,
        )
    )
    sol = deflation.DeflatedGmres(ls, tol=1e-8, store_arnoldi=True)
    ritz = deflation.Ritz(sol)
    ev = recycling.evaluators.RitzApproxKrylov(mode=mode, tol=1e-8)
    try:
        t = ev.evaluate(ritz, frozenset({0}))
        assert t >= 0
    except AssumptionError:
        pass  # legitimate outcome for 'direct' when tol is not predicted
    # cache hit on second evaluation
    t2 = None
    try:
        t2 = ev.evaluate(ritz, frozenset({1}))
    except AssumptionError:
        pass
    assert ev._arnoldifyer is not None


def test_ritz_apriori_intervals_strategy():
    N = 30
    d = numpy.linspace(1, 2, N)
    d[0] = 1e-3
    ls = linsys.ConvertedTimedLinearSystem(
        linsys.LinearSystem(
            numpy.diag(d),
            numpy.ones((N, 1)),
            normal=True,
            self_adjoint=True,
            positive_definite=True,
        )
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sol = deflation.DeflatedCg(ls, tol=1e-8, store_arnoldi=True)
    ritz = deflation.Ritz(sol)
    ev = recycling.evaluators.RitzApriori(
        Bound=utils.BoundCG, strategy="intervals"
    )
    # smallest Ritz value deflated: intervals strategy may or may not
    # satisfy the gap assumption; both outcomes are exercised
    try:
        t = ev.evaluate(ritz, frozenset({int(numpy.argmin(ritz.values))}))
        assert t >= 0
    except AssumptionError:
        pass


def test_ritz_extremal_generator():
    N = 20
    d = numpy.linspace(-1, 2, N)
    ls = linsys.LinearSystem(
        numpy.diag(d), numpy.ones((N, 1)), normal=True, self_adjoint=True
    )
    sol = deflation.DeflatedGmres(ls, tol=1e-8, store_arnoldi=True)
    ritz = deflation.Ritz(sol)
    gen = recycling.generators.RitzExtremal()
    subsets = gen.generate(ritz, set(range(len(ritz.values))))
    # self-adjoint indefinite: min/max of both branches
    assert 1 <= len(subsets) <= 4
    for s in subsets:
        assert len(s) == 1
    # max_vectors cap
    gen = recycling.generators.RitzExtremal(max_vectors=0)
    assert gen.generate(ritz, set(range(len(ritz.values)))) == []


@pytest.mark.parametrize("pseudo_type", ["omit", "hermitian", "normal"])
def test_bound_pseudo_modes(pseudo_type):
    """bound_pseudo with native pseudospectra (reference required the
    external pseudopy package for these modes)."""
    N = 20
    d = numpy.linspace(1, 2, N)
    d[0] = 1e-2
    self_adjoint = pseudo_type != "normal"
    if pseudo_type == "normal":
        # normal but not hermitian: rotate two modes
        A = numpy.diag(d).astype(complex)
        A[3, 3] = 1.5 + 0.1j
        A[4, 4] = 1.5 - 0.1j
    else:
        A = numpy.diag(d)
    ls = linsys.LinearSystem(
        A,
        numpy.ones((N, 1)),
        normal=True,
        self_adjoint=self_adjoint,
        positive_definite=self_adjoint,
    )
    try:
        sol = deflation.DeflatedGmres(
            ls, tol=1e-10, maxiter=12, store_arnoldi=True
        )
    except ConvergenceError as e:
        sol = e.solver
    ritz = deflation.Ritz(sol)
    arn = deflation.Arnoldifyer(sol)
    Wt = ritz.coeffs[:, [int(numpy.argmin(numpy.abs(ritz.values)))]]
    Wt, _ = numpy.linalg.qr(Wt)
    bounds = deflation.bound_pseudo(
        arn, Wt, tol=1e-10, pseudo_type=pseudo_type
    )
    assert len(bounds) >= 1
    assert numpy.isfinite(bounds).all()
    assert (numpy.asarray(bounds) >= 0).all()


def test_bound_pseudo_nonnormal():
    N = 16
    A = numpy.diag(numpy.linspace(1, 2, N))
    A[0, -1] = 0.5  # nonnormal coupling
    ls = linsys.LinearSystem(A, numpy.ones((N, 1)))
    try:
        sol = deflation.DeflatedGmres(
            ls, tol=1e-10, maxiter=8, store_arnoldi=True
        )
    except ConvergenceError as e:
        sol = e.solver
    ritz = deflation.Ritz(sol)
    arn = deflation.Arnoldifyer(sol)
    Wt = numpy.zeros((ritz.coeffs.shape[0], 0))
    bounds = deflation.bound_pseudo(
        arn, Wt, tol=1e-10, pseudo_type="nonnormal"
    )
    assert len(bounds) >= 1
    assert numpy.isfinite(bounds).all()


def test_bound_perturbed_gmres():
    """GMRES perturbation bound with the native disk-union pseudospectrum
    (reference: krypy/utils.py:2006-2033 + external pseudopy)."""
    from krypy_tpu import pseudospectra

    evals = numpy.array([1.0, 2.0, 3.0])
    pseudo = pseudospectra.NormalEvals(evals)
    p = utils.NormalizedRootsPolynomial(evals)
    eps = 1e-3
    bounds = utils.bound_perturbed_gmres(
        pseudo, p, eps, deltas=[1e-2, 5e-2]
    )
    assert len(bounds) == 2
    assert all(numpy.isfinite(b) and b >= 0 for b in bounds)
    with pytest.raises(Exception):
        utils.bound_perturbed_gmres(pseudo, p, eps, deltas=[1e-4])


@pytest.mark.parametrize("mode", ["ritz", "harmonic"])
@pytest.mark.parametrize("with_U", [False, True])
def test_deflated_ritz_resnorms_match_explicit(mode, with_U):
    """The cheap Gram-matrix Ritz residual norms agree with explicitly
    recomputed ones (both modes, with and without deflation basis)."""
    N = 20
    d = numpy.linspace(1, 2, N)
    d[0] = 1e-2
    ls = linsys.LinearSystem(
        numpy.diag(d),
        numpy.ones((N, 1)),
        normal=True,
        self_adjoint=True,
        positive_definite=True,
    )
    U = numpy.eye(N, 2) if with_U else None
    try:
        sol = deflation.DeflatedGmres(
            ls, U=U, tol=1e-10, maxiter=8, store_arnoldi=True
        )
    except ConvergenceError as e:
        sol = e.solver
    ritz = deflation.Ritz(sol, mode=mode)
    explicit = ritz.get_explicit_resnorms()
    # harmonic values can be infinite for singular pencils; compare the
    # finite ones
    finite = numpy.isfinite(ritz.values)
    numpy.testing.assert_allclose(
        ritz.resnorms[finite], explicit[finite], atol=1e-8
    )
    # vectors have unit coefficient norm
    numpy.testing.assert_allclose(
        numpy.linalg.norm(ritz.coeffs, axis=0), 1.0, atol=1e-12
    )
