"""IDR(s): induced-dimension-reduction nonsymmetric solver.

Oracles: true-residual checks against dense operators (real, complex,
preconditioned), the exact-arithmetic finite-termination property
(N + N/s matvecs), s=1..8 parameter sweep, and the same honesty
contract as the sibling short-recurrence cores (stagnation guard,
BREAKDOWN/MAXITER statuses, zero rhs)."""

import numpy
import jax.numpy as jnp

from krypy_tpu import functional as F, ops


def _dense_nonsym(n, seed=0, spread=(1, 20), skew=0.3):
    rng = numpy.random.RandomState(seed)
    A = (numpy.diag(numpy.linspace(*spread, n))
         + skew * numpy.triu(rng.randn(n, n), 1) / numpy.sqrt(n))
    return A, rng


def test_idrs_dense_nonsymmetric():
    A, rng = _dense_nonsym(200)
    b = jnp.asarray(rng.randn(200))
    r = F.idrs(jnp.asarray(A), b, s=4, tol=1e-10, maxiter=500)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_idrs_s_sweep():
    """s = 1, 2, 8 all converge; larger s never needs more matvecs than
    the exact-termination bound N + N/s (+ one slack cycle)."""
    A, rng = _dense_nonsym(120, seed=3)
    b = jnp.asarray(rng.randn(120))
    for s in (1, 2, 8):
        r = F.idrs(jnp.asarray(A), b, s=s, tol=1e-9, maxiter=400)
        assert int(r.status) == 0, f"s={s}"
        rel = float(
            jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
        )
        assert rel <= 1e-9, f"s={s}"
        bound = 120 + 120 // s + (s + 1)
        assert int(r.niter) <= bound, f"s={s}: {int(r.niter)} > {bound}"


def test_idrs_preconditioned_convdiff():
    cd = ops.convection_diffusion_2d(48, 48)
    Mj = ops.jacobi_preconditioner(cd)
    b = jnp.ones(48 * 48, jnp.float64)
    r = F.idrs(cd, b, s=4, M=Mj, tol=1e-9, maxiter=3000)
    assert int(r.status) == 0
    rel = float(jnp.linalg.norm(b - cd(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-9


def test_idrs_beats_bicgstab_on_convection_dominated():
    """The point of s > 1: on a convection-dominated operator IDR(1)
    breaks down (the omega stabilization fails near skew-symmetric
    spectra, exactly like BiCGStab's) while IDR(4)/IDR(8) converge in
    fewer matvecs than BiCGStab (measured here: 105/99 vs 150)."""
    cd = ops.convection_diffusion_2d(40, 40, wind=(40.0, 20.0), eps=0.05)
    b = jnp.ones(1600, jnp.float64)
    rb = F.bicgstab(cd, b, tol=1e-8, maxiter=3000)
    bicg_matvecs = 2 * int(rb.niter)
    prev = None
    for s in (4, 8):
        r = F.idrs(cd, b, s=s, tol=1e-8, maxiter=3000)
        assert int(r.status) == 0, f"s={s}"
        rel = float(jnp.linalg.norm(b - cd(r.x)) / jnp.linalg.norm(b))
        assert rel <= 1e-8, f"s={s}"
        assert int(r.niter) < bicg_matvecs, f"s={s}"
        if prev is not None:
            assert int(r.niter) <= prev + s + 1, "more shadow dims lost"
        prev = int(r.niter)


def test_idrs_complex():
    rng = numpy.random.RandomState(1)
    A = (numpy.diag(numpy.linspace(1, 8, 80))
         + 0.05 * (rng.randn(80, 80) + 1j * rng.randn(80, 80)))
    b = jnp.asarray(rng.randn(80) + 1j * rng.randn(80))
    r = F.idrs(jnp.asarray(A), b, s=4, tol=1e-10, maxiter=300)
    assert int(r.status) == 0
    rel = float(
        jnp.linalg.norm(b - jnp.asarray(A) @ r.x) / jnp.linalg.norm(b)
    )
    assert rel <= 1e-10


def test_idrs_x0_and_resnorm_consistency():
    A, rng = _dense_nonsym(90, seed=7)
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.randn(90))
    x0 = jnp.asarray(rng.randn(90))
    r = F.idrs(Aj, b, s=4, x0=x0, tol=1e-9, maxiter=400)
    assert int(r.status) == 0
    # the final reported resnorm is the EXPLICIT residual (the
    # convergence claim is verified before CONVERGED is reported,
    # reference policy: krypy/linsys.py:430-493): it must match an
    # independent recomputation to rounding
    reported = float(r.resnorms[int(r.niter)])
    true_rel = float(
        jnp.linalg.norm(b - Aj @ r.x) / jnp.linalg.norm(b)
    )
    assert abs(reported - true_rel) <= 1e-12 + 1e-6 * true_rel


def test_idrs_f32_floor_honesty():
    cd = ops.convection_diffusion_2d(32, 32)
    b = jnp.ones(32 * 32, jnp.float32)
    r = F.idrs(cd, b, s=4, tol=1e-13, maxiter=4000, stagnation_window=50)
    assert int(r.status) != 0
    assert bool(jnp.all(jnp.isfinite(r.x)))
    assert numpy.nanmin(numpy.asarray(r.resnorms)) < 1e-2


def test_idrs_zero_rhs():
    A, _ = _dense_nonsym(40)
    r = F.idrs(jnp.asarray(A), jnp.zeros(40), s=4, tol=1e-10)
    assert int(r.status) == 0
    assert float(jnp.linalg.norm(r.x)) == 0.0
    assert int(r.niter) == 0


def test_idrs_column_rhs_shape():
    A, rng = _dense_nonsym(50, seed=9)
    b = jnp.asarray(rng.randn(50, 1))
    r = F.idrs(jnp.asarray(A), b, s=2, tol=1e-9, maxiter=300)
    assert r.x.shape == (50, 1)
    assert int(r.status) == 0


def test_idrs_one_reduce_parity_real():
    """variant='1r' replays the classic biortho recurrence from fused
    cross-Grams (one all-reduce per matvec, pinned in
    test_collectives_surface.py); on a dense nonsymmetric f64 operator
    it must converge to the same tolerance in a comparable number of
    matvecs with the same solution."""
    A, rng = _dense_nonsym(200)
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.randn(200))
    rc = F.idrs(Aj, b, s=4, tol=1e-10, maxiter=500)
    r1 = F.idrs(Aj, b, s=4, tol=1e-10, maxiter=500, variant="1r")
    assert int(r1.status) == 0
    rel = float(jnp.linalg.norm(b - Aj @ r1.x) / jnp.linalg.norm(b))
    assert rel <= 1e-10
    # same cycle count up to one slack cycle each way
    assert abs(int(r1.niter) - int(rc.niter)) <= 5
    assert float(
        jnp.linalg.norm(r1.x - rc.x) / jnp.linalg.norm(rc.x)
    ) <= 1e-8


def test_idrs_one_reduce_parity_complex():
    rng = numpy.random.RandomState(1)
    A = (numpy.diag(numpy.linspace(1, 8, 80))
         + 0.05 * (rng.randn(80, 80) + 1j * rng.randn(80, 80)))
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.randn(80) + 1j * rng.randn(80))
    rc = F.idrs(Aj, b, s=4, tol=1e-10, maxiter=300)
    r1 = F.idrs(Aj, b, s=4, tol=1e-10, maxiter=300, variant="1r")
    assert int(r1.status) == 0
    rel = float(jnp.linalg.norm(b - Aj @ r1.x) / jnp.linalg.norm(b))
    assert rel <= 1e-10
    assert abs(int(r1.niter) - int(rc.niter)) <= 5


def test_idrs_one_reduce_preconditioned_and_s_sweep():
    """The fused scheme survives the right preconditioner (M applies
    stay local, the anchors measure the TRUE residual) and the exact-
    termination bound across s."""
    cd = ops.convection_diffusion_2d(48, 48)
    Mj = ops.jacobi_preconditioner(cd)
    b = jnp.ones(48 * 48, jnp.float64)
    r = F.idrs(cd, b, s=4, M=Mj, tol=1e-9, maxiter=3000, variant="1r")
    assert int(r.status) == 0
    rel = float(jnp.linalg.norm(b - cd(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-9

    A, rng = _dense_nonsym(120, seed=3)
    bb = jnp.asarray(rng.randn(120))
    for s in (1, 2, 8):
        r = F.idrs(jnp.asarray(A), bb, s=s, tol=1e-9, maxiter=400,
                   variant="1r")
        assert int(r.status) == 0, f"s={s}"
        bound = 120 + 120 // s + (s + 1)
        assert int(r.niter) <= bound, f"s={s}: {int(r.niter)} > {bound}"


def test_idrs_one_reduce_final_resnorm_is_explicit():
    """The 1r lane derives intra-cycle norms from anchored expansions,
    but the CONVERGED exit still verifies the claim explicitly: the
    final reported resnorm must match an independent recomputation."""
    A, rng = _dense_nonsym(90, seed=7)
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.randn(90))
    r = F.idrs(Aj, b, s=4, tol=1e-9, maxiter=400, variant="1r")
    assert int(r.status) == 0
    reported = float(r.resnorms[int(r.niter)])
    true_rel = float(jnp.linalg.norm(b - Aj @ r.x) / jnp.linalg.norm(b))
    assert abs(reported - true_rel) <= 1e-12 + 1e-6 * true_rel


def test_idrs_variant_rejects_unknown():
    import pytest

    A, _ = _dense_nonsym(20)
    with pytest.raises(ValueError):
        F.idrs(jnp.asarray(A), jnp.ones(20), variant="bogus")


def test_idrs_sharded():
    """Sharded solve on the 8-device mesh: the (s, N) shadow
    contractions partition into partial dots + all-reduces; result
    stays distributed and correct."""
    import jax

    from krypy_tpu import parallel

    mesh = parallel.make_mesh(8)
    rng = numpy.random.RandomState(3)
    d = jnp.asarray(numpy.linspace(1.0, 30.0, 1024), jnp.float32)
    skew = jnp.asarray(rng.randn(1024) * 0.1, jnp.float32)
    Aop = lambda v: d.astype(v.dtype) * v + skew.astype(v.dtype) * (
        jnp.roll(v, 1)
    )
    b = parallel.shard_vector(jnp.ones(1024, jnp.float32), mesh)
    with mesh:
        r = jax.jit(
            lambda v: F.idrs(Aop, v, s=4, tol=1e-5, maxiter=2000)
        )(b)
    assert int(r.status) == 0
    assert len({s.device for s in r.x.addressable_shards}) == 8
    rel = float(jnp.linalg.norm(b - Aop(r.x)) / jnp.linalg.norm(b))
    assert rel <= 1e-5
