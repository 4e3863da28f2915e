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

__all__ = ["laplacian_2d_kernel", "laplacian_2d", "laplacian_2d_pipelined"]


def _make_pipelined_kernel(nx, ny, T, hx2, hy2):
    n_blocks = nx // T

    def kernel(center_ref, up8_ref, dn8_ref, out_ref):
        i = pl.program_id(0)
        u = center_ref[:, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 1)

        # row 0's upper neighbor comes from the halo view (garbage for the
        # first block, masked to the Dirichlet zero)
        up_edge = jnp.where(i == 0, jnp.zeros((1, ny), u.dtype),
                            up8_ref[7:8, :])
        dn_edge = jnp.where(
            i == n_blocks - 1, jnp.zeros((1, ny), u.dtype), dn8_ref[0:1, :]
        )
        up = jnp.where(row == 0, up_edge, pltpu.roll(u, jnp.int32(1), 0))
        down = jnp.where(
            row == T - 1, dn_edge, pltpu.roll(u, jnp.int32(T - 1), 0)
        )
        left = jnp.where(
            col == 0, 0.0, pltpu.roll(u, jnp.int32(1), 1)
        )
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
def laplacian_2d_pipelined(x, *, nx, ny, block_rows=256, hx2=None,
                           hy2=None, interpret=False):
    """5-point Dirichlet Laplacian with the halo expressed as extra
    BlockSpec views of the input, so Pallas's built-in pipeline double-
    buffers all transfers (no manual DMA).  The 8-row halo views use
    clamped index maps; out-of-domain halos are masked to the boundary
    zero inside the kernel."""
    if hx2 is None:
        hx2 = (1.0 / (nx + 1)) ** 2
    if hy2 is None:
        hy2 = (1.0 / (ny + 1)) ** 2
    while nx % block_rows != 0 or block_rows > nx:
        block_rows //= 2
    block_rows = max(block_rows, 8)
    if nx % 8 != 0 or nx % block_rows != 0:
        raise ValueError("nx must be a multiple of 8")
    T = block_rows
    kernel, n_blocks = _make_pipelined_kernel(nx, ny, T, hx2, hy2)
    r8 = T // 8  # 8-row units per block

    u = x.reshape(nx, ny)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((T, ny), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, ny),
                lambda i: (jnp.maximum(i * r8 - 1, 0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, ny),
                lambda i: (
                    jnp.minimum((i + 1) * r8, nx // 8 - 1), jnp.int32(0)
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, ny), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nx, ny), x.dtype),
        interpret=interpret,
    )(u, u, u)
    return out.reshape(-1)


def _make_kernel(nx, ny, block_rows, hx2, hy2):
    n_blocks = nx // block_rows
    T = block_rows

    def kernel(u_hbm, out_ref, center, up8, dn8, sems):
        i = pl.program_id(0)

        cp = pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(jnp.int32(i * T), 8), T), :], center, sems.at[jnp.int32(0)]
        )
        cp.start()

        if n_blocks > 1:
            @pl.when(i > 0)
            def _up():
                cpu_ = pltpu.make_async_copy(
                    u_hbm.at[pl.ds(pl.multiple_of(jnp.int32(i * T - 8), 8), 8), :], up8, sems.at[jnp.int32(1)]
                )
                cpu_.start()
                cpu_.wait()

            @pl.when(i < n_blocks - 1)
            def _dn():
                cpd = pltpu.make_async_copy(
                    u_hbm.at[pl.ds(pl.multiple_of(jnp.int32((i + 1) * T), 8), 8), :], dn8, sems.at[jnp.int32(2)]
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
