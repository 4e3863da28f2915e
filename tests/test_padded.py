"""Lane-padded grid layout (ops.pad_cols_*, stencil5_affine, padded
multigrid): the TPU-aligned formulation of lane-odd grids.

The padded buffer stores an (nx, ny) Dirichlet grid in (nx, pad128(ny))
with zero pad columns; the first pad column doubles as the Dirichlet
ghost, so padded operators must reproduce the unpadded arithmetic on
the logical region and keep the pads exactly zero (the invariant every
downstream consumer -- norms, dots, repeated applications -- relies
on).  Reference semantics: the unpadded gallery operators themselves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from krypy_tpu import ops
from krypy_tpu.kernels.stencil import stencil5_affine


def _rand_padded(key, nx, ny, ny_pad, dtype=jnp.float64):
    x = jax.random.normal(key, (nx * ny,), dtype)
    return x, ops.pad_cols_vec(x, nx, ny, ny_pad)


def test_pad_cols_width():
    assert ops.pad_cols_width(1) == 128
    assert ops.pad_cols_width(128) == 128
    assert ops.pad_cols_width(129) == 256
    assert ops.pad_cols_width(8191) == 8192


@pytest.mark.parametrize("nx,ny", [(7, 7), (9, 5), (16, 128)])
def test_pad_unpad_roundtrip(nx, ny):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (nx * ny,), jnp.float64)
    xp = ops.pad_cols_vec(x, nx, ny)
    P = ops.pad_cols_width(ny)
    assert xp.shape == (nx * P,)
    # pads are zero
    assert float(jnp.abs(xp.reshape(nx, P)[:, ny:]).max() if P > ny
                 else 0.0) == 0.0
    np.testing.assert_array_equal(
        np.asarray(ops.unpad_cols_vec(xp, nx, ny)), np.asarray(x)
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
    P = Ap.ny_pad
    assert Ap.shape == (nx * P, nx * P)
    key = jax.random.PRNGKey(1)
    x, xp = _rand_padded(key, nx, ny, P)
    yp = Ap(xp)
    if P > ny:
        pads = np.asarray(yp.reshape(nx, P)[:, ny:])
        np.testing.assert_array_equal(pads, np.zeros_like(pads))
    np.testing.assert_allclose(
        np.asarray(ops.unpad_cols_vec(yp, nx, ny)),
        np.asarray(A(x)),
        rtol=1e-13, atol=1e-13,
    )


@pytest.mark.parametrize("nx,ny", [(9, 120), (17, 100)])
def test_stencil5_affine_interpret_matches_jnp(nx, ny):
    """The Pallas affine kernel (interpret mode on CPU) matches the jnp
    padded lowering: plain matvec, damped-Jacobi step, residual."""
    P = ops.pad_cols_width(ny)
    coeffs = (4.1, -1.0, -0.9, -1.1, -0.8)
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    _, up = _rand_padded(k1, nx, ny, P, jnp.float32)
    _, rp = _rand_padded(k2, nx, ny, P, jnp.float32)
    u2 = up.reshape(nx, P)

    # plain matvec (alpha = beta = 0)
    got = stencil5_affine(
        up, nx=nx, ny=P, coeffs=coeffs, ncols=ny, interpret=True
    )
    want = ops._stencil5_padded_jnp(u2, coeffs, ny).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )

    # damped-Jacobi step: u + w*(r - A u) with S = -w*A fused in
    w = 0.2
    got = stencil5_affine(
        up, rp, nx=nx, ny=P, coeffs=tuple(-w * c for c in coeffs),
        ncols=ny, alpha=1.0, beta=w, interpret=True,
    )
    want = (
        u2 + w * (rp.reshape(nx, P)
                  - ops._stencil5_padded_jnp(u2, coeffs, ny))
    )
    # the fused form re-zeroes pads explicitly
    want = want * (jnp.arange(P) < ny)[None, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want.reshape(-1)),
        rtol=2e-6, atol=2e-6,
    )

    # residual: r - A u (beta = 1, coeffs negated)
    got = stencil5_affine(
        up, rp, nx=nx, ny=P, coeffs=tuple(-c for c in coeffs),
        ncols=ny, beta=1.0, interpret=True,
    )
    want = rp.reshape(nx, P) - ops._stencil5_padded_jnp(u2, coeffs, ny)
    want = want * (jnp.arange(P) < ny)[None, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want.reshape(-1)),
        rtol=2e-6, atol=2e-6,
    )


def test_stencil5_affine_pad_invariant_repeated():
    """Pads stay exactly zero under repeated padded applications
    (the invariant the padded multigrid and solvers rely on)."""
    nx, ny = 9, 100
    P = ops.pad_cols_width(ny)
    coeffs = (4.0, -1.0, -1.0, -1.0, -1.0)
    key = jax.random.PRNGKey(3)
    _, xp = _rand_padded(key, nx, ny, P, jnp.float32)
    for _ in range(3):
        xp = stencil5_affine(
            xp, nx=nx, ny=P, coeffs=coeffs, ncols=ny, interpret=True
        )
    pads = np.asarray(xp.reshape(nx, P)[:, ny:])
    np.testing.assert_array_equal(pads, np.zeros_like(pads))


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
    P = mgp.ny_pad
    key = jax.random.PRNGKey(4)
    r, rp = _rand_padded(key, nx, nx, P)
    got = mgp(rp)
    pads = np.asarray(got.reshape(nx, P)[:, nx:])
    np.testing.assert_array_equal(pads, np.zeros_like(pads))
    np.testing.assert_allclose(
        np.asarray(ops.unpad_cols_vec(got, nx, nx)),
        np.asarray(mg(r)),
        rtol=1e-12, atol=1e-12,
    )


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
    P = Ap.ny_pad
    b = jnp.ones(nx * nx, jnp.float64)
    bp = ops.pad_cols_vec(b, nx, nx, P)

    res = F.gmres(A, b, Ml=Ml, tol=1e-10, maxiter=60)
    resp = F.gmres(Ap, bp, Ml=Mlp, tol=1e-10, maxiter=60)
    xp = ops.unpad_cols_vec(resp.x, nx, nx, P)
    # both converged to the same true solution
    rel = float(jnp.linalg.norm(b - A(xp)) / jnp.linalg.norm(b))
    assert rel < 1e-9
    np.testing.assert_allclose(
        np.asarray(xp), np.asarray(res.x), rtol=1e-7, atol=1e-9
    )
