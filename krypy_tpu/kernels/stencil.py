"""Pallas 5-point Laplacian matvec with in-kernel halo handling.

The jnp formulation of the stencil (krypy_tpu/ops.py:poisson_2d) lowers to
pad/slice temporaries; this kernel instead streams row-blocks of the grid
through VMEM, reading each input element once (plus an 8-row halo chunk per
block edge) and writing the output once -- the HBM-roofline formulation.

Alignment: TPU DMA slices must be tiling-aligned (8 sublanes for f32), so
the vertical halo is fetched as separate aligned 8-row chunks above/below
the block; the in-block neighbor shifts are sublane/lane rolls with
boundary-row fixups.  Dirichlet zero boundary.

Status (measured on TPU v5e at 1024^2 f32, scalar-fetch-synced timing):
XLA's lowering of the jnp stencil: ~1055us; the manual-DMA kernel
(:func:`laplacian_2d_kernel`): ~547us; the BlockSpec-pipelined kernel
(:func:`laplacian_2d_pipelined`, Pallas double-buffers the block and halo
views automatically): ~350us with 512-row blocks -- 3x faster than XLA.
``ops.poisson_2d(impl="pallas")`` selects the pipelined kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "laplacian_2d_kernel",
    "laplacian_2d",
    "laplacian_2d_pipelined",
    "stencil5_pipelined",
    "stencil5_affine",
    "stencil5_jacobi2",
    "stencil5_resrestrict_rows",
    "stencil5_sharded",
]


def _largest_divisor_mult8(n, cap):
    """Largest divisor of ``n`` that is a multiple of 8 and <= cap
    (``n`` itself a multiple of 8 guarantees at least 8)."""
    best = 8
    d = 8
    while d <= cap:
        if n % d == 0:
            best = d
        d += 8
    return best


def _make_stencil5_kernel(ny, T, n_blocks, nrows, cc, cu, cd, cl, cr,
                          *, ncols=None, alpha=0.0, beta=0.0,
                          has_g=False):
    """Kernel body for the affine constant-coefficient 5-point stencil
    ``out = alpha*u + beta*g + cc*u + cu*u[i-1,:] + cd*u[i+1,:]
    + cl*u[:,j-1] + cr*u[:,j+1]`` with Dirichlet zero boundaries.

    ``nrows`` is the true (unpadded) row count; rows beyond it are zero
    padding.  ``ncols`` (default ``ny``) is the true column count: with
    ``ncols < ny`` the trailing columns are lane padding -- their
    neighbor reads are masked to the Dirichlet zero and their OUTPUT is
    zeroed, so the zero-pad invariant survives repeated applications
    (the lane-aligned formulation of the 2^k-1 multigrid grids).

    The optional second operand ``g`` (``has_g``) rides the same block
    pipeline; ``alpha``/``beta`` are compile-time floats, so the plain
    matvec (alpha=beta=0), the damped-Jacobi step
    (alpha=1, beta=omega/diag, stencil coeffs scaled by -omega/diag) and
    the residual (beta=1, coeffs negated) are each ONE fused kernel at
    2-3 HBM passes."""
    ncols = ny if ncols is None else ncols

    def kernel(center_ref, up8_ref, dn8_ref, *rest):
        g_ref = rest[0] if has_g else None
        out_ref = rest[-1]
        i = pl.program_id(0)
        u = center_ref[:, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 1)

        # row 0's upper neighbor comes from the halo view (garbage for the
        # first block, masked to the Dirichlet zero); same below
        up_edge = jnp.where(i == 0, jnp.zeros((1, ny), u.dtype),
                            up8_ref[7:8, :])
        dn_edge = jnp.where(
            i == n_blocks - 1, jnp.zeros((1, ny), u.dtype), dn8_ref[0:1, :]
        )
        up = jnp.where(row == 0, up_edge, pltpu.roll(u, jnp.int32(1), 0))
        down = jnp.where(
            row == T - 1, dn_edge, pltpu.roll(u, jnp.int32(T - 1), 0)
        )
        # the row below the last true row is the Dirichlet zero, not the
        # zero-padded garbage neighborhood
        glob_row = i * T + row
        down = jnp.where(glob_row == nrows - 1, 0.0, down)
        left = jnp.where(
            col == 0, 0.0, pltpu.roll(u, jnp.int32(1), 1)
        )
        right = jnp.where(
            col >= ncols - 1, 0.0, pltpu.roll(u, jnp.int32(ny - 1), 1)
        )
        # grouped difference form: algebraically identical to
        # cc*u + cu*up + ... but the (u - neighbor) differences cancel
        # BEFORE rounding, so on smooth fields the f32 output error is
        # eps*|u - n| instead of eps*|c*u| -- measured 1.7-4x tighter
        # true-residual floors in the padded north-star lane
        a, b2, c2, d2 = -cu, -cd, -cl, -cr
        e = cc + cu + cd + cl + cr
        out = (a * (u - up) + b2 * (u - down)
               + c2 * (u - left) + d2 * (u - right))
        if e != 0.0:
            out = out + e * u
        if alpha != 0.0:
            out = out + alpha * u
        if has_g and beta != 0.0:
            out = out + beta * g_ref[:, :]
        if ncols != ny:
            # keep the lane padding exactly zero in the output
            out = jnp.where(col >= ncols, 0.0, out)
        if nrows != n_blocks * T:
            # same for sublane (row) padding: the grid-padded layout
            # keeps pad rows in the buffer across applications
            out = jnp.where(glob_row >= nrows, 0.0, out)
        out_ref[:, :] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "ncols", "nrows", "coeffs", "alpha", "beta",
        "block_rows", "interpret",
    ),
)
def stencil5_affine(x, g=None, *, nx, ny, coeffs, ncols=None, nrows=None,
                    alpha=0.0, beta=0.0, block_rows=256, interpret=None):
    """Affine constant-coefficient 5-point stencil
    ``out = alpha*x + beta*g + Stencil5(x)`` on an ``nx x ny`` Dirichlet
    grid (flat operands), fused into ONE pipelined Pallas kernel: 2-3
    HBM passes where the jnp lowering of e.g. a damped-Jacobi step
    (``u + (omega/diag)*(r - A u)``) costs ~6.

    ``coeffs = (cc, cu, cd, cl, cr)``, ``alpha``, ``beta`` are static
    Python floats.  ``ncols < ny`` declares the trailing columns as lane
    padding (kept exactly zero in the output): the lane-ALIGNED
    formulation of lane-odd grids -- e.g. the 2^k-1 multigrid/north-star
    grids, where Mosaic needs the 128-multiple width the logical grid
    lacks.  The zero pad column doubles as the Dirichlet ghost, so the
    arithmetic on the logical region is exactly the unpadded stencil's.
    ``nrows < nx`` does the same for trailing PAD ROWS (the grid-padded
    layout): with ``nx`` a multiple of 8 the buffer needs no per-call
    row padding, so the kernel runs with ZERO copies around it --
    the measured cost of the legacy pad+slice pair at 8191^2 f32 was
    ~2x the kernel itself (benchmarks/RESULTS_r5.md ablation).

    Any ``nx`` is supported: non-multiple-of-8 row counts fall back to
    the legacy zero-pad + slice-off pair.
    """
    if interpret is None:
        # Mosaic compiles on TPU only; elsewhere run interpreted
        interpret = jax.default_backend() != "tpu"
    cc, cu, cd, cl, cr = (float(c) for c in coeffs)
    has_g = g is not None
    nrows = nx if nrows is None else nrows
    u = x.reshape(nx, ny)
    gg = g.reshape(nx, ny) if has_g else None

    # VMEM budget: the pipeline multi-buffers center+out (+halo views,
    # +g when present); empirically ~6 block-sized buffers live at once
    # (8 with g), so keep the block small enough that they fit in ~11MB
    # of the 16MB VMEM.
    # block_rows MUST stay a multiple of 8: the halo views are addressed
    # in 8-row units (r8 = T//8), so any other block height silently
    # misaligns the halos and corrupts the block-boundary rows.
    bpe = jnp.dtype(x.dtype).itemsize
    streams = 8 if has_g else 6
    vmem_cap = max(8, (11 * 2**20) // (streams * ny * bpe))
    cap = max(8, min(block_rows, vmem_cap) // 8 * 8)
    if nx % 8 == 0:
        # grid-padded fast path: a block height dividing nx exactly
        # means NO pad/slice copies around the kernel
        T = _largest_divisor_mult8(nx, min(cap, nx))
        nx_pad = nx
    else:
        # legacy path: pad rows to a multiple of the block (zero rows
        # are consistent with the Dirichlet boundary; the kernel masks
        # the last true row's lower neighbor so it does not read pad
        # garbage -- pads ARE zero though, so the mask is belt and
        # braces) and slice the pad off afterwards
        T = min(cap, -(-nx // 8) * 8)
        nx_pad = -(-nx // T) * T
        u = jnp.pad(u, ((0, nx_pad - nx), (0, 0)))
        if has_g:
            gg = jnp.pad(gg, ((0, nx_pad - nx), (0, 0)))
    n_blocks = nx_pad // T
    r8 = T // 8  # 8-row units per block

    kernel = _make_stencil5_kernel(
        ny, T, n_blocks, min(nrows, nx), cc, cu, cd, cl, cr,
        ncols=ncols, alpha=alpha, beta=beta, has_g=has_g,
    )
    block = pl.BlockSpec((T, ny), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM)
    in_specs = [
        block,
        pl.BlockSpec(
            (8, ny),
            lambda i: (jnp.maximum(i * r8 - 1, 0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (8, ny),
            lambda i: (
                jnp.minimum((i + 1) * r8, nx_pad // 8 - 1), jnp.int32(0)
            ),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [u, u, u]
    if has_g:
        in_specs.append(block)
        operands.append(gg)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((nx_pad, ny), x.dtype),
        interpret=interpret,
    )(*operands)
    if nx_pad != nx:
        out = out[:nx]
    return out.reshape(-1)


def stencil5_pipelined(x, *, nx, ny, coeffs, block_rows=256,
                       interpret=None):
    """Constant-coefficient 5-point stencil matvec on an ``nx x ny``
    Dirichlet grid (flat input/output): :func:`stencil5_affine` with
    ``alpha = beta = 0`` and no second operand (see there for the
    pipeline/halo design; the jnp/XLA lowering of the same stencil is
    ~3x slower at 1M dof on TPU v5e, see module docstring)."""
    return stencil5_affine(
        x, nx=nx, ny=ny, coeffs=coeffs, block_rows=block_rows,
        interpret=interpret,
    )


def _make_jacobi2_kernel(ny, T, n_blocks, nrows, lapc, w, s, *, ncols):
    """Kernel body for :func:`stencil5_jacobi2`: TWO damped-Jacobi
    sweeps ``v = u + w (g - A u)``, ``out = s (v + w (g - A v))`` in one
    VMEM residency (temporal blocking).  The intermediate ``v`` is
    computed on the block EXTENDED by the 8-row halo views above and
    below, so the second sweep's edge rows read a locally-recomputed
    ``v`` halo instead of a second HBM round trip.  Out-of-range
    extended rows (before the grid, past ``nrows``) are zeroed by
    POSITION, which subsumes the Dirichlet row fixups: a neighbor read
    past either edge sees exactly the boundary zero.  Per-stage
    arithmetic replicates :func:`_make_stencil5_kernel`'s grouped
    difference form term-for-term (same compile-time constant products,
    same add order), so the fused kernel matches two chained
    :func:`stencil5_affine` steps to ~1 ulp (only FMA contraction
    choices differ between the program shapes)."""
    Te = T + 16

    def stage_consts(sk):
        sc = tuple(-sk * w * c for c in lapc)
        cc, cu, cd, cl, cr = sc
        a, b2, c2, d2 = -cu, -cd, -cl, -cr
        e = cc + cu + cd + cl + cr
        return a, b2, c2, d2, e, sk, sk * w

    st1 = stage_consts(1.0)
    st2 = stage_consts(s)

    def kernel(uc_ref, up8_ref, dn8_ref, gc_ref, gup8_ref, gdn8_ref,
               out_ref):
        i = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (Te, ny), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Te, ny), 1)
        grow = i * T + row - 8
        valid = (grow >= 0) & (grow < nrows)

        ue = jnp.concatenate(
            [up8_ref[:, :], uc_ref[:, :], dn8_ref[:, :]], axis=0
        )
        ge = jnp.concatenate(
            [gup8_ref[:, :], gc_ref[:, :], gdn8_ref[:, :]], axis=0
        )
        # the edge-clamped halo views hold in-buffer data from the WRONG
        # rows; zero them by position (grow < 0 past the top edge,
        # grow >= nrows past the bottom / in the row padding)
        zero = jnp.zeros((), ue.dtype)
        ue = jnp.where(valid, ue, zero)
        ge = jnp.where(valid, ge, zero)

        def stage(v, consts):
            a, b2, c2, d2, e, alpha, beta = consts
            # rolls wrap at the extended-block edges: rows 0 and Te-1
            # are garbage there, but those rows' OUTPUT is never
            # consumed (stage 1 is used on rows 7..Te-8+1 only, stage 2
            # on the center T); mask them anyway so `valid` zeroing
            # keeps every intermediate finite
            up = jnp.where(
                row == 0, zero, pltpu.roll(v, jnp.int32(1), 0)
            )
            down = jnp.where(
                row == Te - 1, zero, pltpu.roll(v, jnp.int32(Te - 1), 0)
            )
            left = jnp.where(
                col == 0, 0.0, pltpu.roll(v, jnp.int32(1), 1)
            )
            right = jnp.where(
                col >= ncols - 1, 0.0, pltpu.roll(v, jnp.int32(ny - 1), 1)
            )
            out = (a * (v - up) + b2 * (v - down)
                   + c2 * (v - left) + d2 * (v - right))
            if e != 0.0:
                out = out + e * v
            if alpha != 0.0:
                out = out + alpha * v
            if beta != 0.0:
                out = out + beta * ge
            if ncols != ny:
                out = jnp.where(col >= ncols, 0.0, out)
            return jnp.where(valid, out, zero)

        v = stage(ue, st1)
        o = stage(v, st2)
        out_ref[:, :] = o[8:8 + T, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "coeffs", "w", "s", "ncols", "nrows", "block_rows",
        "interpret",
    ),
)
def stencil5_jacobi2(u, g, *, nx, ny, coeffs, w, s=1.0, ncols, nrows,
                     block_rows=64, interpret=None):
    """Two damped-Jacobi sweeps ``out = s (v + w (g - A v))`` with
    ``v = u + w (g - A u)`` fused into ONE pipelined kernel on the
    grid-padded layout (``coeffs`` = the OPERATOR ``A``'s five
    coefficients; ``s`` folds an output scale into the second sweep).

    Temporal blocking: the intermediate sweep never round-trips through
    HBM, so a smoothing PAIR costs ~4 passes (u and g each read with
    their 8-row halo views, one write) instead of the ~7 of two chained
    :func:`stencil5_affine` steps.  Matches the chained pair to ~1 ulp
    (same grouped-difference constants and add order per stage; only
    FMA contraction differs).  ``nx`` must be a multiple of 8 (the
    grid-padded invariant)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if nx % 8 != 0:
        raise ValueError(f"stencil5_jacobi2: nx must be a multiple of 8, "
                         f"got {nx}")
    lapc = tuple(float(c) for c in coeffs)
    uu = u.reshape(nx, ny)
    gg = g.reshape(nx, ny)

    # VMEM: pipeline buffers (2x{u, g, out} blocks + 4 halo views) plus
    # the in-kernel extended temporaries (ue, ge, v, o at T+16 rows)
    bpe = jnp.dtype(u.dtype).itemsize
    vmem_cap = max(8, (11 * 2**20) // (12 * ny * bpe))
    cap = max(8, min(block_rows, vmem_cap) // 8 * 8)
    T = _largest_divisor_mult8(nx, min(cap, nx))
    n_blocks = nx // T
    r8 = T // 8

    kernel = _make_jacobi2_kernel(
        ny, T, n_blocks, nrows, lapc, float(w), float(s), ncols=ncols,
    )
    center = pl.BlockSpec((T, ny), lambda i: (i, jnp.int32(0)),
                          memory_space=pltpu.VMEM)
    up8 = pl.BlockSpec(
        (8, ny), lambda i: (jnp.maximum(i * r8 - 1, 0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    dn8 = pl.BlockSpec(
        (8, ny),
        lambda i: (jnp.minimum((i + 1) * r8, nx // 8 - 1), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[center, up8, dn8, center, up8, dn8],
        out_specs=center,
        out_shape=jax.ShapeDtypeStruct((nx, ny), u.dtype),
        interpret=interpret,
    )(uu, uu, uu, gg, gg, gg)
    return out.reshape(-1)


def _make_resrestrict_kernel(ny, Tc, n_blocks, nrows, cc, cu, cd, cl, cr,
                             *, ncols):
    """Kernel body for :func:`stencil5_resrestrict_rows`: the residual
    ``res = g + Stencil5(u)`` (coeffs pre-negated by the caller, grouped
    difference form) followed by full-weighting ROW restriction
    ``out[I] = 0.25 res[2I] + 0.5 res[2I+1] + 0.25 res[2I+2]`` in the
    same VMEM residency.  The sublane decimation rides the MXU: a tiny
    constant banded matrix ``W (Tc, 2Tc)`` built from iotas contracts
    the 2Tc in-register residual rows to Tc output rows (strided sublane
    slices are not portably supported by Mosaic; the matmul is, and its
    FLOPs are noise next to the streamed bytes).  The one residual row
    each block needs from its lower neighbor (fine row ``2(i+1)Tc``) is
    recomputed from the 8-row halo views."""
    T2 = 2 * Tc
    ncoarse = (nrows - 1) // 2
    a, b2, c2, d2 = -cu, -cd, -cl, -cr
    e = cc + cu + cd + cl + cr

    def kernel(uc_ref, up8_ref, dn8_ref, gc_ref, gdn8_ref, out_ref):
        i = pl.program_id(0)
        u = uc_ref[:, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (T2, ny), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T2, ny), 1)

        up_edge = jnp.where(i == 0, jnp.zeros((1, ny), u.dtype),
                            up8_ref[7:8, :])
        dn_edge = jnp.where(
            i == n_blocks - 1, jnp.zeros((1, ny), u.dtype), dn8_ref[0:1, :]
        )
        up = jnp.where(row == 0, up_edge, pltpu.roll(u, jnp.int32(1), 0))
        down = jnp.where(
            row == T2 - 1, dn_edge, pltpu.roll(u, jnp.int32(T2 - 1), 0)
        )
        glob = i * T2 + row
        down = jnp.where(glob == nrows - 1, 0.0, down)
        left = jnp.where(col == 0, 0.0, pltpu.roll(u, jnp.int32(1), 1))
        right = jnp.where(
            col >= ncols - 1, 0.0, pltpu.roll(u, jnp.int32(ny - 1), 1)
        )
        res = (a * (u - up) + b2 * (u - down)
               + c2 * (u - left) + d2 * (u - right))
        if e != 0.0:
            res = res + e * u
        res = res + gc_ref[:, :]
        res = jnp.where(glob >= nrows, 0.0, res)
        if ncols != ny:
            res = jnp.where(col >= ncols, 0.0, res)

        # the extra residual row: fine row f* = 2(i+1)Tc, i.e. row 0 of
        # the next center block, rebuilt from the halo views (u at
        # f*-1 = last center row, f* = dn8[0], f*+1 = dn8[1]; g at
        # f* = gdn8[0]).  Masked to zero when f* is past the logical
        # grid (last block), which also covers the clamped halo views.
        col1 = jax.lax.broadcasted_iota(jnp.int32, (1, ny), 1)
        ustar = dn8_ref[0:1, :]
        up_s = u[T2 - 1:T2, :]
        dn_s = dn8_ref[1:2, :]
        gstar = (i + 1) * T2
        dn_s = jnp.where(gstar == nrows - 1, 0.0, dn_s)
        left_s = jnp.where(
            col1 == 0, 0.0, pltpu.roll(ustar, jnp.int32(1), 1)
        )
        right_s = jnp.where(
            col1 >= ncols - 1, 0.0, pltpu.roll(ustar, jnp.int32(ny - 1), 1)
        )
        res_s = (a * (ustar - up_s) + b2 * (ustar - dn_s)
                 + c2 * (ustar - left_s) + d2 * (ustar - right_s))
        if e != 0.0:
            res_s = res_s + e * ustar
        res_s = res_s + gdn8_ref[0:1, :]
        res_s = jnp.where(gstar >= nrows, 0.0, res_s)
        if ncols != ny:
            res_s = jnp.where(col1 >= ncols, 0.0, res_s)

        # W[I, k] = 0.25 (k==2I) + 0.5 (k==2I+1) + 0.25 (k==2I+2)
        wi = jax.lax.broadcasted_iota(jnp.int32, (Tc, T2), 0)
        wk = jax.lax.broadcasted_iota(jnp.int32, (Tc, T2), 1)
        # keep every intermediate in u.dtype: a bare where(mask, .25, 0)
        # would make f64 under x64, which Mosaic cannot lay out
        W = (0.25 * (wk == 2 * wi).astype(u.dtype)
             + 0.5 * (wk == 2 * wi + 1).astype(u.dtype)
             + 0.25 * (wk == 2 * wi + 2).astype(u.dtype))
        out = jax.lax.dot(
            W, res, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=u.dtype,
        )
        rowc = jax.lax.broadcasted_iota(jnp.int32, (Tc, ny), 0)
        # row Tc-1's k = 2Tc term is the recomputed halo residual row
        out = out + jnp.where(rowc == Tc - 1, 0.25 * res_s, 0.0)
        out = jnp.where(i * Tc + rowc >= ncoarse, 0.0, out)
        out_ref[:, :] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "coeffs", "ncols", "nrows", "block_rows", "interpret",
    ),
)
def stencil5_resrestrict_rows(u, g, *, nx, ny, coeffs, ncols, nrows,
                              block_rows=64, interpret=None):
    """Fused residual + full-weighting ROW restriction on the
    grid-padded layout: ``out[I, :] = 0.25 res[2I] + 0.5 res[2I+1]
    + 0.25 res[2I+2]`` with ``res = g + Stencil5(u)`` (pass the NEGATED
    operator coefficients, as :func:`stencil5_affine`'s residual form
    does), for ``I < (nrows-1)//2``; rows/cols beyond the logical
    region are kept exactly zero.  Output shape ``(nx//2, ny)`` flat.

    This replaces the V-cycle's separate residual kernel (3 HBM passes)
    + jnp row/column restriction (~2.3 passes) with ONE kernel at ~2.5
    passes -- the residual never round-trips through HBM.  ``nx`` must
    be a multiple of 16 (so the half-height output keeps 8-row tiling);
    the caller (ops._multigrid_padded) falls back to the unfused pair
    otherwise."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if nx % 16 != 0:
        raise ValueError("stencil5_resrestrict_rows: nx must be a "
                         f"multiple of 16, got {nx}")
    cc, cu, cd, cl, cr = (float(c) for c in coeffs)
    uu = u.reshape(nx, ny)
    gg = g.reshape(nx, ny)

    # VMEM: per block ~2x{u(2Tc), g(2Tc), out(Tc)} + 3 halo chunks
    bpe = jnp.dtype(u.dtype).itemsize
    vmem_cap = max(8, (11 * 2**20) // (10 * ny * bpe))
    cap = max(8, min(block_rows, vmem_cap) // 8 * 8)
    Tc = _largest_divisor_mult8(nx // 2, min(cap, nx // 2))
    T2 = 2 * Tc
    n_blocks = (nx // 2) // Tc
    r8 = T2 // 8

    kernel = _make_resrestrict_kernel(
        ny, Tc, n_blocks, nrows, cc, cu, cd, cl, cr, ncols=ncols,
    )
    center = pl.BlockSpec((T2, ny), lambda i: (i, jnp.int32(0)),
                          memory_space=pltpu.VMEM)
    up8 = pl.BlockSpec(
        (8, ny), lambda i: (jnp.maximum(i * r8 - 1, 0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    dn8 = pl.BlockSpec(
        (8, ny),
        lambda i: (jnp.minimum((i + 1) * r8, nx // 8 - 1), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[center, up8, dn8, center, dn8],
        out_specs=pl.BlockSpec((Tc, ny), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx // 2, ny), u.dtype),
        interpret=interpret,
    )(uu, uu, uu, gg, gg)
    return out.reshape(-1)


def stencil5_sharded(x, *, nx, ny, coeffs, mesh, axis_name=None,
                     block_rows=256, interpret=None):
    """Multi-device 5-point stencil matvec: the Pallas kernel per shard,
    one-row halo exchange over ICI.

    The flat vector is sharded along N over the mesh's first axis; with
    ``nx`` divisible by the mesh size every device owns a contiguous
    row-block of the grid.  Each device runs :func:`stencil5_pipelined`
    on its block (which applies Dirichlet zeros at the block's top/bottom
    edge), the true neighbor rows travel one hop via ``ppermute``, and the
    two edge rows are corrected with the halo contribution -- an O(ny)
    fixup against the O(nx_local*ny) kernel.  ``ppermute`` delivers zeros
    to endpoints with no source, which IS the Dirichlet boundary, so no
    masking is needed.

    This closes the single-device-only limitation of the Pallas lane: the
    same roofline kernel now runs per-chip under ``shard_map``, with the
    halo riding ICI instead of GSPMD-inferred collectives.
    """
    axis_name = mesh.axis_names[0] if axis_name is None else axis_name
    n_dev = mesh.shape[axis_name]
    if nx % n_dev != 0:
        raise ValueError(
            f"nx={nx} must be divisible by the mesh size {n_dev} for the "
            "sharded Pallas stencil (use the jnp impl otherwise)"
        )
    nx_loc = nx // n_dev
    cc, cu, cd, cl, cr = (float(c) for c in coeffs)
    P = jax.sharding.PartitionSpec

    def local(xs):
        u = xs.reshape(nx_loc, ny)
        # send my bottom row down (it is the lower neighbor's top halo)
        # and my top row up; endpoints receive zeros = Dirichlet.
        down_edges = [(i, i + 1) for i in range(n_dev - 1)]
        up_edges = [(i + 1, i) for i in range(n_dev - 1)]
        top_halo = jax.lax.ppermute(u[-1:, :], axis_name, down_edges)
        bot_halo = jax.lax.ppermute(u[:1, :], axis_name, up_edges)
        out = stencil5_pipelined(
            xs, nx=nx_loc, ny=ny, coeffs=(cc, cu, cd, cl, cr),
            block_rows=block_rows, interpret=interpret,
        ).reshape(nx_loc, ny)
        out = out.at[0, :].add(cu * top_halo[0])
        out = out.at[-1, :].add(cd * bot_halo[0])
        return out.reshape(-1)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-
    # axes annotation, which the default check rejects
    return jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name),
        check_vma=False,
    )(x)


def laplacian_2d_pipelined(x, *, nx, ny, block_rows=256, hx2=None,
                           hy2=None, interpret=None):
    """5-point Dirichlet Laplacian via :func:`stencil5_pipelined`."""
    if hx2 is None:
        hx2 = (1.0 / (nx + 1)) ** 2
    if hy2 is None:
        hy2 = (1.0 / (ny + 1)) ** 2
    return stencil5_pipelined(
        x,
        nx=nx,
        ny=ny,
        coeffs=(
            2.0 / hx2 + 2.0 / hy2,
            -1.0 / hx2,
            -1.0 / hx2,
            -1.0 / hy2,
            -1.0 / hy2,
        ),
        block_rows=block_rows,
        interpret=interpret,
    )


def _make_kernel(nx, ny, block_rows, hx2, hy2):
    n_blocks = nx // block_rows
    T = block_rows

    def kernel(u_hbm, out_ref, center, up8, dn8, sems):
        i = pl.program_id(0)

        cp = pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(jnp.int32(i * T), 8), T), :],
            center,
            sems.at[jnp.int32(0)],
        )
        cp.start()

        if n_blocks > 1:
            @pl.when(i > 0)
            def _up():
                cpu_ = pltpu.make_async_copy(
                    u_hbm.at[
                        pl.ds(pl.multiple_of(jnp.int32(i * T - 8), 8), 8), :
                    ],
                    up8,
                    sems.at[jnp.int32(1)],
                )
                cpu_.start()
                cpu_.wait()

            @pl.when(i < n_blocks - 1)
            def _dn():
                cpd = pltpu.make_async_copy(
                    u_hbm.at[
                        pl.ds(pl.multiple_of(jnp.int32((i + 1) * T), 8), 8), :
                    ],
                    dn8,
                    sems.at[jnp.int32(2)],
                )
                cpd.start()
                cpd.wait()

            @pl.when(i == 0)
            def _up_zero():
                up8[:, :] = jnp.zeros((8, ny), up8.dtype)

            @pl.when(i == n_blocks - 1)
            def _dn_zero():
                dn8[:, :] = jnp.zeros((8, ny), dn8.dtype)
        else:
            up8[:, :] = jnp.zeros((8, ny), up8.dtype)
            dn8[:, :] = jnp.zeros((8, ny), dn8.dtype)

        cp.wait()
        u = center[:, :]

        row = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 1)

        # vertical neighbors: sublane roll with edge-row fixup from the
        # halo chunks
        up = jnp.where(
            row == 0, up8[7:8, :], pltpu.roll(u, jnp.int32(1), 0)
        )
        down = jnp.where(
            row == T - 1, dn8[0:1, :], pltpu.roll(u, jnp.int32(T - 1), 0)
        )
        # horizontal neighbors: lane roll, zero at the domain boundary
        left = jnp.where(col == 0, 0.0, pltpu.roll(u, jnp.int32(1), 1))
        right = jnp.where(
            col == ny - 1, 0.0, pltpu.roll(u, jnp.int32(ny - 1), 1)
        )

        out_ref[:, :] = (2.0 * u - up - down) / hx2 + (
            2.0 * u - left - right
        ) / hy2

    return kernel, n_blocks


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "block_rows", "hx2", "hy2", "interpret"),
)
def laplacian_2d_kernel(x, *, nx, ny, block_rows=256, hx2=None, hy2=None,
                        interpret=False):
    """Apply the Dirichlet 5-point Laplacian to the flat vector ``x``
    (grid ``nx`` x ``ny``).  ``nx`` must be a multiple of 8 (sublane
    tiling); ``block_rows`` is clipped to a divisor of nx."""
    if hx2 is None:
        hx2 = (1.0 / (nx + 1)) ** 2
    if hy2 is None:
        hy2 = (1.0 / (ny + 1)) ** 2
    while nx % block_rows != 0 or block_rows > nx:
        block_rows //= 2
    block_rows = max(block_rows, 8)
    if nx % 8 != 0 or nx % block_rows != 0:
        raise ValueError("nx must be a multiple of 8")

    kernel, n_blocks = _make_kernel(nx, ny, block_rows, hx2, hy2)
    u = x.reshape(nx, ny)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (block_rows, ny), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nx, ny), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows, ny), x.dtype),
            pltpu.VMEM((8, ny), x.dtype),
            pltpu.VMEM((8, ny), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(u)
    return out.reshape(-1)


def laplacian_2d(nx, ny=None, block_rows=256, interpret=False):
    """Operator-gallery style constructor returning a matvec closure
    (drop-in for :func:`krypy_tpu.ops.poisson_2d`)."""
    ny = nx if ny is None else ny

    def matvec(x):
        return laplacian_2d_kernel(
            x, nx=nx, ny=ny, block_rows=block_rows, interpret=interpret
        )

    matvec.shape = (nx * ny, nx * ny)
    hx2 = (1.0 / (nx + 1)) ** 2
    hy2 = (1.0 / (ny + 1)) ** 2
    matvec.diag = jnp.full(nx * ny, 2.0 / hx2 + 2.0 / hy2)
    return matvec
