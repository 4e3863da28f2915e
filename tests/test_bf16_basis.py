"""Reduced-precision Krylov-basis storage (``basis_dtype=``).

The Krylov buffer is stored in bfloat16 while all control scalars and
accumulations stay at the system dtype; contraction reads then move half
the HBM bytes.  The attainable TRUE residual is floored at
``eps(basis_dtype) * kappa(A)`` (solution reassembly from quantized
rows), so the feature targets well-conditioned operators; these tests
pin both the win and the floor.

Reference: krypy stores the basis at the system dtype
(krypy/utils.py:902-906); no low-precision analog exists there.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from krypy_tpu import functional as F


def _diag_system(kappa=50.0, N=512, seed=0):
    rng = np.random.default_rng(seed)
    d = np.linspace(1.0, kappa, N)
    D = jnp.asarray(d, jnp.float32)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)
    return d, (lambda v: D.astype(v.dtype) * v), b


def _true_rel(d, x, b):
    x64 = np.asarray(x, np.float64)
    b64 = np.asarray(b, np.float64)
    return np.linalg.norm(b64 - d * x64) / np.linalg.norm(b64)


@pytest.mark.parametrize("ortho", ["cgs2", "bmgs2"])
def test_bf16_basis_well_conditioned(ortho):
    """kappa=50: bfloat16 basis converges to the eps*kappa floor."""
    d, A, b = _diag_system()
    r = F.gmres(A, b, tol=0.0, maxiter=40, ortho=ortho,
                basis_dtype=jnp.bfloat16)
    rel = _true_rel(d, r.x, b)
    # eps(bf16) = 2^-8 ~ 3.9e-3; kappa = 50 -> floor well under 5e-2
    assert rel < 5e-2, rel
    # and the full-precision basis must do strictly better
    r32 = F.gmres(A, b, tol=0.0, maxiter=40, ortho=ortho)
    assert _true_rel(d, r32.x, b) < rel


def test_bf16_basis_refine_to_tight_tolerance():
    """GMRES-IR composition: bf16 inner + f64 outer reaches 1e-8."""
    import jax

    d, A, b = _diag_system()
    b64 = jnp.asarray(np.asarray(b), jnp.float64)
    inner = jax.jit(
        lambda rr: F.gmres(A, rr, tol=1e-2, maxiter=40, ortho="cgs2",
                           basis_dtype=jnp.bfloat16)
    )
    res, info = F.refine_to(A, b64, inner, tol=1e-8)
    assert float(np.nanmin(np.asarray(res.resnorms))) <= 1e-8
    assert info["cycles"] >= 2  # bf16 floor forces multiple cycles


def test_bf16_basis_guards():
    _, A, b = _diag_system(N=64)
    B = jnp.eye(64, dtype=jnp.float32)
    with pytest.raises(ValueError, match="Euclidean"):
        F.gmres(A, b, ip=B, maxiter=4, basis_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="batched"):
        F.gmres(A, b, ortho="mgs", maxiter=4, basis_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="real"):
        F.gmres(A, b.astype(jnp.complex64), maxiter=4,
                basis_dtype=jnp.bfloat16)


@pytest.mark.parametrize("basis,s", [("monomial", 2), ("newton", 4)])
def test_bf16_basis_ca_gmres(basis, s):
    """ca_gmres(basis_dtype=bfloat16): same eps*kappa contract as gmres
    -- converges to the floor on kappa=50, full precision does better.
    The monomial basis is tested at s=2 (its kappa^s conditioning
    amplifies the quantization error at larger s; newton does not)."""
    d, A, b = _diag_system()
    r = F.ca_gmres(A, b, s=s, basis=basis, tol=0.0, maxiter=40,
                   basis_dtype=jnp.bfloat16)
    rel = _true_rel(d, r.x, b)
    assert rel < 8e-2, rel
    r32 = F.ca_gmres(A, b, s=s, basis=basis, tol=0.0, maxiter=40)
    assert _true_rel(d, r32.x, b) < rel


def test_bf16_basis_ca_gmres_guards():
    _, A, b = _diag_system(N=64)
    with pytest.raises(ValueError, match="real"):
        F.ca_gmres(A, b.astype(jnp.complex64), s=2, maxiter=4,
                   basis_dtype=jnp.bfloat16)


def test_bf16_basis_ill_conditioned_floor_is_honest():
    """On kappa ~ 1e3 the bf16 floor exceeds 10% -- the solver must not
    claim convergence below it when the explicit-residual policy runs."""
    d, A, b = _diag_system(kappa=2000.0)
    r = F.gmres(A, b, tol=1e-6, maxiter=60, ortho="cgs2",
                explicit_residual=True, basis_dtype=jnp.bfloat16)
    # status must NOT be CONVERGED: the floor eps*kappa ~ 8 >> tol
    assert int(r.status) != int(F.CONVERGED)


def test_bf16_basis_one_reduce_composition():
    """basis_dtype composes with the one-reduce scheme (VERDICT r4 #2):
    quantized sealed rows + a full-precision trailing-candidate side
    vector reach the same eps(bf16)*kappa floor as the cgs2 quantized
    path, and on a mesh the iteration still costs exactly ONE
    all-reduce (pinned; auto resolves to the composed scheme)."""
    d, A, b = _diag_system()
    r1 = F.gmres(A, b, tol=0.0, maxiter=40, ortho="cgs2_1r",
                 basis_dtype=jnp.bfloat16)
    rel1 = _true_rel(d, r1.x, b)
    assert rel1 < 5e-2, rel1
    # full-precision 1r must do strictly better
    r32 = F.gmres(A, b, tol=0.0, maxiter=40, ortho="cgs2_1r")
    assert _true_rel(d, r32.x, b) < rel1
    # basis buffer is genuinely stored narrow: HBM-traffic lever intact
    _, ints = F.gmres(A, b, tol=0.0, maxiter=8, ortho="cgs2_1r",
                      basis_dtype=jnp.bfloat16, return_internal=True)
    assert ints["V"].dtype == jnp.bfloat16


def test_bf16_basis_one_reduce_mesh_pin():
    import jax

    from krypy_tpu import ops, parallel
    from helpers import loop_body_allreduces

    mesh = parallel.make_mesh(8)
    lap = ops.poisson_2d(32)
    b = parallel.shard_vector(jnp.ones(32 * 32, jnp.float32), mesh)
    with mesh:
        onered = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-2, maxiter=24,
                              ortho="cgs2_1r", basis_dtype=jnp.bfloat16)
        )
        auto = jax.jit(
            lambda v: F.gmres(lap, v, tol=1e-2, maxiter=24,
                              ortho="auto", basis_dtype=jnp.bfloat16)
        )
    assert loop_body_allreduces(onered, b, mesh=mesh) == 1
    assert loop_body_allreduces(auto, b, mesh=mesh) == 1
    with mesh:
        r = onered(b)
        ra = auto(b)
    assert float(jnp.linalg.norm(ra.x - r.x)) == 0.0


def test_bf16_basis_one_reduce_refine_to_tight_tolerance():
    """GMRES-IR over the COMPOSED lane: bf16 one-reduce inner + f64
    outer reaches 1e-8 -- the memory lever and the latency lever stack
    for tight tolerances too."""
    import jax

    d, A, b = _diag_system()
    b64 = jnp.asarray(np.asarray(b), jnp.float64)
    inner = jax.jit(
        lambda rr: F.gmres(A, rr, tol=1e-2, maxiter=40, ortho="cgs2_1r",
                           basis_dtype=jnp.bfloat16)
    )
    res, info = F.refine_to(A, b64, inner, tol=1e-8)
    assert float(np.nanmin(np.asarray(res.resnorms))) <= 1e-8


def test_bf16_basis_needs_right_preconditioning_at_high_kappa():
    """Mechanism test (round-5 north-star finding): basis quantization
    noise is HIGH-FREQUENCY, the raw operator amplifies it by
    lambda_max while the solution lives at lambda_min -- so with LEFT
    preconditioning the true-residual floor is eps(bf16)*kappa(A)
    regardless of preconditioner quality (> 1 here: the solve cannot
    even improve on x0), while with RIGHT preconditioning the assembly
    is x = Mr(V y) and the smoother filters the rough noise, dropping
    the floor to ~eps(bf16)*kappa(A Mr)."""
    import jax

    from krypy_tpu import ops

    nx = 127
    N = nx * nx
    h2 = (1.0 / (nx + 1)) ** 2
    cd = ops.convection_diffusion_2d(
        nx, wind=(1.0 * h2, 0.5 * h2), eps=1.0 * h2
    )
    Mg = ops.multigrid_poisson_preconditioner(nx, coarsest=31)
    M = lambda r: Mg(r) * (1.0 / h2)
    b = jnp.ones(N, jnp.float32) * jnp.float32(h2)

    def true_rel(x):
        return float(
            jnp.linalg.norm(b - cd(x)) / jnp.linalg.norm(b)
        )

    rl = F.gmres(cd, b, Ml=M, tol=1e-3, maxiter=24, ortho="cgs2_1r",
                 basis_dtype=jnp.bfloat16)
    rr = F.gmres(cd, b, Mr=M, tol=1e-3, maxiter=24, ortho="cgs2_1r",
                 basis_dtype=jnp.bfloat16)
    # left: floored at eps*kappa(A) ~ O(100) -- no progress possible
    assert true_rel(rl.x) > 0.5
    # right: the smoother filters the quantization noise
    assert true_rel(rr.x) < 5e-2
