"""Chebyshev-Jackson filtered subspace iteration (functional.filtered).

The reference exposes no eigensolver (only Ritz extraction,
krypy/utils.py:1380-1465); oracles here are ``numpy.linalg.eigvalsh``
windows, analytic Laplacian spectra and the shift-invert ``eigsh``
cross-check.
"""

import numpy
import pytest

import jax
import jax.numpy as jnp

from krypy_tpu import functional as F, ops, parallel
from krypy_tpu.functional.filtered import (
    eigsh_window,
    estimate_spectrum_bounds,
    jackson_cheby_coeffs,
    kpm_dos,
    window_count,
)


def _random_hermitian(n, seed=0, scale=10.0, complex_=False):
    rng = numpy.random.default_rng(seed)
    Q, _ = numpy.linalg.qr(
        rng.standard_normal((n, n))
        + (1j * rng.standard_normal((n, n)) if complex_ else 0)
    )
    ew = numpy.sort(rng.standard_normal(n)) * scale
    Am = (Q * ew) @ Q.conj().T
    return (Am + Am.conj().T) / 2, ew


def _check_window(Am, ew, r, i0, i1, vtol=1e-7):
    """The inside pairs must be EXACTLY the oracle's window slice, with
    explicit per-vector residuals."""
    ni = int(r.n_inside)
    assert ni == i1 - i0, (ni, i1 - i0)
    th = numpy.asarray(r.theta[:ni])
    assert numpy.allclose(th, ew[i0:i1], atol=1e-7 * numpy.abs(ew).max())
    U = numpy.asarray(r.U)
    anorm = numpy.abs(ew).max()
    for i in range(ni):
        res = numpy.linalg.norm(Am @ U[:, i] - th[i] * U[:, i])
        assert res <= vtol * anorm, (i, res)
    # orthonormal inside block
    G = U[:, :ni].conj().T @ U[:, :ni]
    assert numpy.allclose(G, numpy.eye(ni), atol=1e-6)


def test_window_dense_oracle():
    Am, ew = _random_hermitian(300, seed=0)
    lo, hi = float(ew[140]) - 1e-6, float(ew[149]) + 1e-6
    r = eigsh_window(jnp.asarray(Am), (lo, hi), block=16, tol=1e-9)
    assert int(r.status) == 0
    assert not bool(r.saturated)
    _check_window(Am, ew, r, 140, 150)
    # bounds contain the true spectrum (filter-safety contract)
    assert r.bounds[0] <= ew[0] and r.bounds[1] >= ew[-1]


def test_window_laplacian_analytic():
    """1D Laplacian via a CALLABLE with n=: interior window against the
    analytic spectrum 2 - 2 cos(j pi / (n+1))."""
    n = 400
    ew = 2.0 - 2.0 * numpy.cos(numpy.arange(1, n + 1) * numpy.pi / (n + 1))

    def mv(v):
        lower = jnp.concatenate([v[1:], jnp.zeros(1, v.dtype)])
        upper = jnp.concatenate([jnp.zeros(1, v.dtype), v[:-1]])
        return 2.0 * v - lower - upper

    # the mid-spectrum spacing is ~2 pi / (n+1): the filter transition
    # (~pi * span / degree) must resolve it, so the dense-spectrum case
    # needs a DEGREE matched to the level spacing, not the window width
    # (documented knob; the auto default targets the window width)
    lo, hi = float(ew[199]) - 1e-9, float(ew[204]) + 1e-9
    r = eigsh_window(
        mv, (lo, hi), block=16, n=n, tol=1e-9, degree=600, maxiter=200
    )
    assert int(r.status) == 0
    ni = int(r.n_inside)
    assert ni == 6
    assert numpy.allclose(numpy.asarray(r.theta[:ni]), ew[199:205], atol=1e-8)


def test_window_complex_hermitian():
    """Complex oracle: catches the S^T-vs-S^H row-transform convention
    in SVQB/RR (invisible in real arithmetic) and the complex default
    start block."""
    Am, ew = _random_hermitian(150, seed=3, complex_=True)
    lo, hi = float(ew[70]) - 1e-6, float(ew[75]) + 1e-6
    r = eigsh_window(jnp.asarray(Am), (lo, hi), block=10, tol=1e-9)
    assert int(r.status) == 0
    _check_window(Am, ew, r, 70, 76)


def test_window_saturated_block():
    """More window eigenvalues than block rows: every live pair ends up
    inside and the result says so (the count is in doubt, not the
    accuracy of the pairs returned)."""
    Am, ew = _random_hermitian(200, seed=1)
    lo, hi = float(ew[80]) - 1e-6, float(ew[99]) + 1e-6  # 20 inside
    r = eigsh_window(jnp.asarray(Am), (lo, hi), block=8, tol=1e-7,
                     maxiter=60)
    assert bool(r.saturated)
    ni = int(r.n_inside)
    # every inside pair whose residual PASSED the tolerance must be a
    # genuine window eigenvalue (unconverged pairs advertise themselves
    # through pair_resnorms -- that is the per-pair contract)
    th = numpy.asarray(r.theta[:ni])
    res = numpy.asarray(r.pair_resnorms[:ni])
    # in the saturated regime convergence ratios between the competing
    # window eigenvalues approach 1, so full tol is not reached -- the
    # per-pair contract is what holds: backward error res bounds the
    # eigenvalue error by res * ||A|| (Hermitian)
    ok = res <= 1e-5
    assert ok.sum() >= 4  # most of the block still resolved
    anorm = numpy.abs(ew).max()
    dist = numpy.abs(th[ok][:, None] - ew[None, 80:100]).min(axis=1)
    assert (dist <= 2.0 * res[ok] * anorm + 1e-12).all()


def test_window_empty_is_honest():
    """A window inside a spectral gap: no pairs, MAXITER (the solver
    cannot distinguish 'nothing there' from 'not converged')."""
    d = numpy.concatenate([numpy.linspace(0, 1, 50),
                           numpy.linspace(9, 10, 50)])
    Am = numpy.diag(d)
    r = eigsh_window(jnp.asarray(Am), (4.0, 6.0), block=6, maxiter=8)
    assert int(r.n_inside) == 0
    assert int(r.status) == 1  # MAXITER


def test_window_cross_check_shift_invert():
    """Same interior pairs as eigsh(sigma=...) on the same operator."""
    Am, ew = _random_hermitian(200, seed=5)
    sigma = float((ew[99] + ew[100]) / 2)
    lo, hi = float(ew[97]) - 1e-6, float(ew[102]) + 1e-6
    rw = eigsh_window(jnp.asarray(Am), (lo, hi), block=10, tol=1e-9)
    Sinv = jnp.asarray(
        numpy.linalg.inv(Am - sigma * numpy.eye(Am.shape[0]))
    )
    rs = F.eigsh(
        jnp.asarray(Am), k=6, sigma=sigma,
        inv=lambda v: Sinv @ v, tol=1e-9,
    )
    assert int(rw.status) == 0 and int(rs.status) == 0
    ni = int(rw.n_inside)
    assert ni == 6
    assert numpy.allclose(
        numpy.sort(numpy.asarray(rw.theta[:ni])),
        numpy.sort(numpy.asarray(rs.theta)),
        atol=1e-7 * numpy.abs(ew).max(),
    )


def test_window_user_bounds_and_degree():
    Am, ew = _random_hermitian(150, seed=7)
    lo, hi = float(ew[70]) - 1e-6, float(ew[74]) + 1e-6
    r = eigsh_window(
        jnp.asarray(Am), (lo, hi), block=9, tol=1e-8,
        bounds=(float(ew[0]) - 1.0, float(ew[-1]) + 1.0), degree=250,
    )
    assert int(r.status) == 0
    assert r.degree == 250
    _check_window(Am, ew, r, 70, 75)


def test_window_f32_backward():
    """f32 with the backward criterion: tolerances relative to ||A||
    are attainable where |theta|-relative ones are not."""
    Am, ew = _random_hermitian(200, seed=11)
    Am32 = Am.astype(numpy.float32)
    lo, hi = float(ew[95]) - 1e-5, float(ew[100]) + 1e-5
    r = eigsh_window(jnp.asarray(Am32), (lo, hi), block=10, tol=2e-5,
                     criterion="backward")
    assert int(r.status) == 0
    ni = int(r.n_inside)
    assert ni == 6
    assert numpy.allclose(
        numpy.asarray(r.theta[:ni]), ew[95:101],
        atol=1e-3 * numpy.abs(ew).max(),
    )


def test_estimate_spectrum_bounds_contains():
    Am, ew = _random_hermitian(250, seed=2)
    lmin, lmax = estimate_spectrum_bounds(jnp.asarray(Am))
    assert lmin <= ew[0] and lmax >= ew[-1]
    # ... and not absurdly loose (within ~20% of the span each side)
    span = ew[-1] - ew[0]
    assert lmin >= ew[0] - 0.2 * span
    assert lmax <= ew[-1] + 0.2 * span


def test_jackson_coeffs_filter_shape():
    """The damped expansion approximates the indicator: ~1 inside,
    ~0 far outside, non-negative up to small ringing."""
    co, c, e = jackson_cheby_coeffs(-0.2, 0.2, -1.0, 1.0, 120)
    t = numpy.linspace(-1, 1, 2001)
    x = (t - c) / e
    # evaluate sum c_j T_j(x) by recurrence
    T0, T1 = numpy.ones_like(x), x
    y = co[0] * T0 + co[1] * T1
    for j in range(2, len(co)):
        T0, T1 = T1, 2 * x * T1 - T0
        y += co[j] * T1
    assert y[numpy.abs(t) <= 0.15].min() > 0.5
    assert numpy.abs(y[numpy.abs(t) >= 0.4]).max() < 0.02
    assert y.min() > -0.01  # Jackson damping kills sign flips


def test_window_count_dense_oracle():
    """Filtered-trace count vs the exact count, with edge gaps wider
    than the filter transition (edge eigenvalues are otherwise counted
    fractionally -- documented)."""
    Am, ew = _random_hermitian(400, seed=6)
    lo = float((ew[149] + ew[150]) / 2)
    hi = float((ew[219] + ew[220]) / 2)
    true = 70
    cnt, se = window_count(
        jnp.asarray(Am), (lo, hi), jax.random.PRNGKey(0),
        n_probes=24, degree=400,
    )
    # Hutchinson: relative error ~ sqrt(2 * count) / (count sqrt(t))
    assert abs(cnt - true) <= max(4 * se, 0.12 * true), (cnt, se)


def test_window_count_sizes_the_block():
    """The advertised workflow: count first, then solve with a block
    sized from the count -- no saturation."""
    Am, ew = _random_hermitian(250, seed=8)
    lo = float((ew[119] + ew[120]) / 2)
    hi = float((ew[127] + ew[128]) / 2)  # 8 inside
    cnt, se = window_count(
        jnp.asarray(Am), (lo, hi), jax.random.PRNGKey(1), n_probes=24
    )
    block = int(numpy.ceil(1.3 * cnt)) + 4
    r = eigsh_window(jnp.asarray(Am), (lo, hi), block=block, tol=1e-8)
    assert int(r.status) == 0
    assert not bool(r.saturated)
    assert int(r.n_inside) == 8


def test_kpm_dos_semicircle_normalization():
    """DOS of a dense GOE-like matrix: integrates to N and matches the
    Wigner semicircle shape at mid-spectrum."""
    n = 600
    rng = numpy.random.default_rng(12)
    G = rng.standard_normal((n, n)) / numpy.sqrt(n)
    Am = (G + G.T) / numpy.sqrt(2)  # GOE, semicircle radius R = 2
    grid, dens = kpm_dos(
        jnp.asarray(Am), jax.random.PRNGKey(2),
        degree=200, n_probes=24, npoints=400,
    )
    total = numpy.trapezoid(dens, grid)
    assert abs(total - n) <= 0.05 * n
    # semicircle rho(0) = 2N/(pi R); Jackson smearing at finite degree
    # flattens the top slightly (measured ~ -3%)
    rho0 = 2.0 * n / (numpy.pi * 2.0)
    mid = numpy.abs(grid) < 0.1
    assert numpy.allclose(dens[mid].mean(), rho0, rtol=0.1)


def test_window_validation():
    Am, ew = _random_hermitian(50, seed=0)
    A = jnp.asarray(Am)
    with pytest.raises(ValueError, match="lo < hi"):
        eigsh_window(A, (1.0, 1.0), block=4)
    with pytest.raises(ValueError, match="block"):
        eigsh_window(A, (0.0, 1.0), block=0)
    with pytest.raises(ValueError, match="outside the spectrum"):
        eigsh_window(A, (1e6, 2e6), block=4)
    with pytest.raises(ValueError, match="block=, k= or X0="):
        eigsh_window(A, (0.0, 1.0))
    with pytest.raises(ValueError, match="n= or X0="):
        eigsh_window(lambda v: v, (0.0, 1.0), block=4)


def test_window_sharded_matches_single_device():
    """8-device mesh: the sharded solve reproduces the single-device
    window pairs (filter matvecs stay local, the SVQB/RR Grams become
    partial dots + psum)."""
    mesh = parallel.make_mesh(8)
    nx = 16
    lap = ops.poisson_2d(nx)
    N = nx * nx
    h = numpy.pi / (nx + 1)
    # ops.poisson_2d scales by 1/h^2 (unit-square Dirichlet Laplacian)
    ew = numpy.sort(
        (
            4.0
            - 2.0 * numpy.cos(h * numpy.arange(1, nx + 1))[:, None]
            - 2.0 * numpy.cos(h * numpy.arange(1, nx + 1))[None, :]
        ).ravel()
    ) * (nx + 1) ** 2
    # window edges INSIDE gaps (the spectrum is full of degenerate
    # (i,j)/(j,i) pairs; an edge on a pair would split it -- ew[99] and
    # ew[100] ARE such a pair, so the lower edge goes below both)
    lo = float((ew[98] + ew[99]) / 2)
    hi = float((ew[105] + ew[106]) / 2)
    kwargs = dict(
        block=12, tol=1e-9, degree=400, maxiter=150,
        bounds=(0.0, 8.0 * (nx + 1) ** 2),
    )
    r0 = eigsh_window(lap, (lo, hi), n=N, **kwargs)
    X0 = numpy.stack(
        [
            numpy.cos(numpy.arange(N) * (0.7391 + 0.1137 * i))
            + 0.01 * (i + 1)
            for i in range(12)
        ],
        axis=1,
    )
    X0s = parallel.shard_vector(jnp.asarray(X0).T, mesh).T
    with mesh:
        r1 = eigsh_window(lap, (lo, hi), X0=X0s, **kwargs)
    assert int(r0.status) == 0 and int(r1.status) == 0
    assert int(r1.n_inside) == int(r0.n_inside)
    ni = int(r0.n_inside)
    assert numpy.allclose(
        numpy.asarray(r1.theta[:ni]), numpy.asarray(r0.theta[:ni]),
        rtol=1e-9,
    )


def test_window_x0_and_k_defaults():
    """X0 fixes the block width; k= alone picks a sensible default."""
    Am, ew = _random_hermitian(120, seed=4)
    lo, hi = float(ew[55]) - 1e-6, float(ew[58]) + 1e-6
    rng = numpy.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((120, 8)))
    r = eigsh_window(jnp.asarray(Am), (lo, hi), X0=X0, tol=1e-8)
    assert r.theta.shape == (8,)
    assert int(r.status) == 0
    rk = eigsh_window(jnp.asarray(Am), (lo, hi), k=4, tol=1e-8)
    assert rk.theta.shape == (8,)  # 4 + max(4, 2)
    assert int(rk.n_inside) == 4
