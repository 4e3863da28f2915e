"""Grid-padded layout (ops.pad_grid_*, stencil5_affine, padded
multigrid): the TPU-aligned formulation of lane-odd grids.

The padded buffer stores an (nx, ny) Dirichlet grid in
(pad8(nx), pad128(ny)) with zero pad rows/columns; the first pad
row/column doubles as the Dirichlet ghost, so padded operators must
reproduce the unpadded arithmetic on the logical region and keep the
pads exactly zero (the invariant every downstream consumer -- norms,
dots, repeated applications -- relies on).  Reference semantics: the
unpadded gallery operators themselves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from krypy_tpu import ops
from krypy_tpu.kernels.stencil import stencil5_affine


def _shapes(nx, ny):
    return ops.pad_rows_width(nx), ops.pad_cols_width(ny)


def _rand_padded(key, nx, ny, dtype=jnp.float64):
    x = jax.random.normal(key, (nx * ny,), dtype)
    return x, ops.pad_grid_vec(x, nx, ny)


def test_pad_widths():
    assert ops.pad_cols_width(1) == 128
    assert ops.pad_cols_width(128) == 128
    assert ops.pad_cols_width(129) == 256
    assert ops.pad_cols_width(8191) == 8192
    assert ops.pad_rows_width(1) == 8
    assert ops.pad_rows_width(8) == 8
    assert ops.pad_rows_width(8191) == 8192


@pytest.mark.parametrize("nx,ny", [(7, 7), (9, 5), (16, 128)])
def test_pad_unpad_roundtrip(nx, ny):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (nx * ny,), jnp.float64)
    xp = ops.pad_grid_vec(x, nx, ny)
    R, P = _shapes(nx, ny)
    assert xp.shape == (R * P,)
    u = np.asarray(xp.reshape(R, P))
    assert np.all(u[nx:, :] == 0.0) and np.all(u[:, ny:] == 0.0)
    np.testing.assert_array_equal(
        np.asarray(ops.unpad_grid_vec(xp, nx, ny)), np.asarray(x)
    )


@pytest.mark.parametrize("op_name", ["poisson", "convdiff"])
@pytest.mark.parametrize("nx,ny", [(7, 7), (15, 15), (9, 5), (8, 128)])
def test_padded_matvec_matches_unpadded(op_name, nx, ny):
    """Padded jnp matvec == unpadded matvec on the logical region, and
    the output pads stay exactly zero."""
    if op_name == "poisson":
        A = ops.poisson_2d(nx, ny)
        Ap = ops.poisson_2d(nx, ny, pad_cols=True)
    else:
        A = ops.convection_diffusion_2d(nx, ny, wind=(1.0, 0.5), eps=0.7)
        Ap = ops.convection_diffusion_2d(
            nx, ny, wind=(1.0, 0.5), eps=0.7, pad_cols=True
        )
    R, P = Ap.nx_pad, Ap.ny_pad
    assert Ap.shape == (R * P, R * P)
    key = jax.random.PRNGKey(1)
    x, xp = _rand_padded(key, nx, ny)
    yp = Ap(xp)
    u = np.asarray(yp.reshape(R, P))
    assert np.all(u[nx:, :] == 0.0) and np.all(u[:, ny:] == 0.0)
    np.testing.assert_allclose(
        np.asarray(ops.unpad_grid_vec(yp, nx, ny)),
        np.asarray(A(x)),
        rtol=1e-13, atol=1e-13,
    )


@pytest.mark.parametrize("nx,ny", [(9, 120), (17, 100), (16, 100)])
def test_stencil5_affine_interpret_matches_jnp(nx, ny):
    """The Pallas affine kernel (interpret mode on CPU) matches the jnp
    padded lowering: plain matvec, damped-Jacobi step, residual.
    nx=16 exercises the grid-padded (no pad/slice) fast path with
    nrows < buffer rows."""
    R, P = _shapes(nx, ny)
    coeffs = (4.1, -1.0, -0.9, -1.1, -0.8)
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    _, up = _rand_padded(k1, nx, ny, jnp.float32)
    _, rp = _rand_padded(k2, nx, ny, jnp.float32)
    u2 = up.reshape(R, P)

    def mask(a):
        a = a * (jnp.arange(P) < ny)[None, :]
        return a * (jnp.arange(R) < nx)[:, None]

    # plain matvec (alpha = beta = 0)
    got = stencil5_affine(
        up, nx=R, ny=P, coeffs=coeffs, ncols=ny, nrows=nx,
        interpret=True,
    )
    want = ops._stencil5_padded_jnp(u2, coeffs, nx, ny).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )

    # damped-Jacobi step: u + w*(r - A u) with S = -w*A fused in
    w = 0.2
    got = stencil5_affine(
        up, rp, nx=R, ny=P, coeffs=tuple(-w * c for c in coeffs),
        ncols=ny, nrows=nx, alpha=1.0, beta=w, interpret=True,
    )
    want = mask(
        u2 + w * (rp.reshape(R, P)
                  - ops._stencil5_padded_jnp(u2, coeffs, nx, ny))
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want.reshape(-1)),
        rtol=2e-6, atol=2e-6,
    )

    # residual: r - A u (beta = 1, coeffs negated)
    got = stencil5_affine(
        up, rp, nx=R, ny=P, coeffs=tuple(-c for c in coeffs),
        ncols=ny, nrows=nx, beta=1.0, interpret=True,
    )
    want = mask(
        rp.reshape(R, P) - ops._stencil5_padded_jnp(u2, coeffs, nx, ny)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want.reshape(-1)),
        rtol=2e-6, atol=2e-6,
    )


def test_stencil5_affine_pad_invariant_repeated():
    """Pads stay exactly zero under repeated padded applications
    (the invariant the padded multigrid and solvers rely on)."""
    nx, ny = 9, 100
    R, P = _shapes(nx, ny)
    coeffs = (4.0, -1.0, -1.0, -1.0, -1.0)
    key = jax.random.PRNGKey(3)
    _, xp = _rand_padded(key, nx, ny, jnp.float32)
    for _ in range(3):
        xp = stencil5_affine(
            xp, nx=R, ny=P, coeffs=coeffs, ncols=ny, nrows=nx,
            interpret=True,
        )
    u = np.asarray(xp.reshape(R, P))
    assert np.all(u[nx:, :] == 0.0) and np.all(u[:, ny:] == 0.0)


def test_stencil5_affine_legacy_rows_unchanged():
    """Callers with nx not a multiple of 8 and no nrows still get the
    legacy internal pad+slice behavior (stencil5_pipelined surface)."""
    nx, ny = 9, 128
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (nx * ny,), jnp.float32)
    coeffs = (4.0, -1.0, -1.0, -1.0, -1.0)
    got = stencil5_affine(x, nx=nx, ny=ny, coeffs=coeffs, interpret=True)
    assert got.shape == (nx * ny,)
    want = ops._stencil5_padded_jnp(
        x.reshape(nx, ny), coeffs, nx, ny
    ).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


@pytest.mark.parametrize("nx", [15, 31, 63])
def test_padded_multigrid_matches_unpadded(nx):
    """Padded V-cycle == unpadded V-cycle (jacobi smoother) on the
    logical region; coefficient-form rounding differences only."""
    mg = ops.multigrid_poisson_preconditioner(
        nx, coarsest=7, coarse_sweeps=12
    )
    mgp = ops.multigrid_poisson_preconditioner(
        nx, coarsest=7, coarse_sweeps=12, pad_cols=True
    )
    R, P = mgp.nx_pad, mgp.ny_pad
    key = jax.random.PRNGKey(4)
    r, rp = _rand_padded(key, nx, nx)
    got = mgp(rp)
    u = np.asarray(got.reshape(R, P))
    assert np.all(u[nx:, :] == 0.0) and np.all(u[:, nx:] == 0.0)
    np.testing.assert_allclose(
        np.asarray(ops.unpad_grid_vec(got, nx, nx)),
        np.asarray(mg(r)),
        rtol=1e-12, atol=1e-12,
    )


@pytest.mark.parametrize("nx", [31, 63])
def test_multigrid_scale_folds(nx):
    """``scale=`` == external ``s * M(r)`` multiply on both lanes.

    On the jnp lanes the fold is bit-exact (the final sweep's output is
    multiplied by the same scalar, just inside the program)."""
    s = 7.5
    kw = dict(coarsest=7, coarse_sweeps=12)
    mg = ops.multigrid_poisson_preconditioner(nx, **kw)
    mgs = ops.multigrid_poisson_preconditioner(nx, scale=s, **kw)
    mgp = ops.multigrid_poisson_preconditioner(nx, pad_cols=True, **kw)
    mgps = ops.multigrid_poisson_preconditioner(
        nx, pad_cols=True, scale=s, **kw
    )
    key = jax.random.PRNGKey(11)
    r, rp = _rand_padded(key, nx, nx)
    np.testing.assert_array_equal(
        np.asarray(mgs(r)), s * np.asarray(mg(r))
    )
    got = mgps(rp)
    # the scaled final sweep preserves the pad-zero invariant
    u = np.asarray(got.reshape(mgps.nx_pad, mgps.ny_pad))
    assert np.all(u[nx:, :] == 0.0) and np.all(u[:, nx:] == 0.0)
    np.testing.assert_array_equal(np.asarray(got), s * np.asarray(mgp(rp)))


def test_multigrid_scale_folds_pallas_lane():
    """The Pallas affine-kernel fold (alpha=s, beta=s*w, scaled coeffs)
    matches the external multiply to f32 rounding.  nx=511 so the fine
    level takes the ``n >= 256`` Pallas branch (interpreted off-TPU);
    coarsest=255 keeps the recursion to one Pallas level."""
    nx, s = 511, 3.0
    kw = dict(
        nu_pre=1, nu_post=1, coarsest=255, coarse_sweeps=2,
        pad_cols=True, impl="pallas",
    )
    mgp = ops.multigrid_poisson_preconditioner(nx, **kw)
    mgps = ops.multigrid_poisson_preconditioner(nx, scale=s, **kw)
    key = jax.random.PRNGKey(12)
    _, rp = _rand_padded(key, nx, nx, dtype=jnp.float32)
    want = s * np.asarray(mgp(rp))
    got = np.asarray(mgps(rp))
    scale_ref = max(1.0, float(np.max(np.abs(want))))
    np.testing.assert_allclose(got, want, atol=5e-6 * scale_ref)


def test_stencil5_resrestrict_rows_matches_unfused():
    """Fused residual + row-restrict kernel == residual kernel followed
    by the jnp full-weighting row pass (bit-exact in interpret mode:
    the W matmul contracts exact power-of-two weights), including the
    recomputed halo row each block takes from its lower neighbor and
    the pad-zero invariant."""
    from krypy_tpu.kernels.stencil import stencil5_resrestrict_rows

    n = 511
    R, P = _shapes(n, n)
    h2 = (1.0 / (n + 1)) ** 2
    lapc = (4.0 / h2, -1.0 / h2, -1.0 / h2, -1.0 / h2, -1.0 / h2)
    rc = tuple(-c for c in lapc)
    key = jax.random.PRNGKey(21)
    _, up = _rand_padded(key, n, n, dtype=jnp.float32)
    _, gp = _rand_padded(jax.random.PRNGKey(22), n, n, dtype=jnp.float32)
    res = stencil5_affine(
        up, gp, nx=R, ny=P, coeffs=rc, ncols=n, nrows=n, beta=1.0,
    ).reshape(R, P)[:n]
    want = 0.25 * res[0:-2:2] + 0.5 * res[1:-1:2] + 0.25 * res[2::2]
    half = np.asarray(
        stencil5_resrestrict_rows(
            up, gp, nx=R, ny=P, coeffs=rc, ncols=n, nrows=n,
        ).reshape(R // 2, P)
    )
    nc = (n - 1) // 2
    assert np.all(half[nc:, :] == 0.0) and np.all(half[:, n:] == 0.0)
    np.testing.assert_array_equal(half[:nc], np.asarray(want))


def test_stencil5_jacobi2_matches_chained_steps():
    """Temporally-blocked Jacobi pair == two chained stencil5_affine
    steps to a couple of ulps (same grouped-difference constants and
    add order per stage; the residual 1-ulp differences are FMA
    contraction choices differing between the two program shapes),
    including the scale fold on the second sweep and the
    recomputed-halo rows at every block edge."""
    from krypy_tpu.kernels.stencil import stencil5_jacobi2

    n = 511
    R, P = _shapes(n, n)
    h2 = (1.0 / (n + 1)) ** 2
    lapc = (4.0 / h2, -1.0 / h2, -1.0 / h2, -1.0 / h2, -1.0 / h2)
    w = 0.8 / (4.0 / h2)
    key = jax.random.PRNGKey(31)
    _, up = _rand_padded(key, n, n, dtype=jnp.float32)
    _, gp = _rand_padded(jax.random.PRNGKey(32), n, n, dtype=jnp.float32)
    for s in (1.0, 3.25):
        sc = tuple(-s * w * c for c in lapc)
        sc1 = tuple(-w * c for c in lapc)
        v = stencil5_affine(
            up, gp, nx=R, ny=P, coeffs=sc1, ncols=n, nrows=n,
            alpha=1.0, beta=w,
        )
        want = stencil5_affine(
            v, gp, nx=R, ny=P, coeffs=sc, ncols=n, nrows=n,
            alpha=s, beta=s * w,
        )
        got = stencil5_jacobi2(
            up, gp, nx=R, ny=P, coeffs=lapc, w=w, s=s, ncols=n, nrows=n,
        )
        scale_ref = float(np.max(np.abs(np.asarray(want))))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6,
            atol=2e-7 * scale_ref,
        )


def test_padded_pallas_vcycle_matches_jnp_lane():
    """Pallas padded V-cycle (presmooth2 collapse + fused
    residual/restrict engaged: nu_pre=2, fine level past the n >= 256
    Pallas cutoff) == jnp padded V-cycle to f32 rounding."""
    nx = 511
    kw = dict(
        nu_pre=2, nu_post=2, coarsest=255, coarse_sweeps=2,
        pad_cols=True,
    )
    mgj = ops.multigrid_poisson_preconditioner(nx, impl="jnp", **kw)
    mgp = ops.multigrid_poisson_preconditioner(nx, impl="pallas", **kw)
    key = jax.random.PRNGKey(23)
    _, rp = _rand_padded(key, nx, nx, dtype=jnp.float32)
    want = np.asarray(mgj(rp))
    got = np.asarray(mgp(rp))
    scale_ref = max(1.0, float(np.max(np.abs(want))))
    np.testing.assert_allclose(got, want, atol=5e-6 * scale_ref)


def test_padded_multigrid_rejects_unsupported():
    with pytest.raises(ValueError):
        ops.multigrid_poisson_preconditioner(
            15, smoother="rbgs", pad_cols=True
        )
    with pytest.raises(ValueError):
        ops.multigrid_poisson_preconditioner(
            15, coarse_solver="dst", pad_cols=True
        )


def test_padded_gmres_solve_matches_unpadded():
    """End to end: left-mg-preconditioned GMRES on the padded layout
    reaches the same solution as the unpadded solve."""
    from krypy_tpu import functional as F

    nx = 31
    A = ops.convection_diffusion_2d(nx, wind=(1.0, 0.5), eps=1.0)
    Ap = ops.convection_diffusion_2d(
        nx, wind=(1.0, 0.5), eps=1.0, pad_cols=True
    )
    Ml = ops.multigrid_poisson_preconditioner(nx, coarsest=7)
    Mlp = ops.multigrid_poisson_preconditioner(
        nx, coarsest=7, pad_cols=True
    )
    b = jnp.ones(nx * nx, jnp.float64)
    bp = ops.pad_grid_vec(b, nx, nx)

    res = F.gmres(A, b, Ml=Ml, tol=1e-10, maxiter=60)
    resp = F.gmres(Ap, bp, Ml=Mlp, tol=1e-10, maxiter=60)
    xp = ops.unpad_grid_vec(resp.x, nx, nx)
    # both converged to the same true solution
    rel = float(jnp.linalg.norm(b - A(xp)) / jnp.linalg.norm(b))
    assert rel < 1e-9
    np.testing.assert_allclose(
        np.asarray(xp), np.asarray(res.x), rtol=1e-7, atol=1e-9
    )
