"""Fused blocked Gram-Schmidt projection kernel.

Computes, for a row-major basis ``V`` of shape ``(m, N)``, a dual basis
``B`` (equal to V unless a preconditioner maintains a second basis), an
iteration vector ``w`` of shape ``(N,)`` and a row mask:

.. math::
    c_j = \\langle V_j, w\\rangle \\cdot \\text{mask}_j, \\qquad
    w' = w - \\sum_j c_j B_j

in one ``pallas_call`` with a two-phase grid: phase 0 sweeps the column
tiles accumulating the coefficients in a VMEM scratch (MXU contraction per
tile), phase 1 sweeps again applying the update.  The coefficient vector
never round-trips through HBM and the kernel exposes the natural tiling
hook for double-buffered DMA.

This is the Euclidean-inner-product fast path used by the functional GMRES
core (reference MGS loop: krypy/utils.py:1012-1029; the batched-CGS
reformulation has dmgs-class stability, see krypy_tpu/arnoldi.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cgs_project", "cgs2_fused"]


def _kernel(V_ref, B_ref, w_ref, mask_ref, wout_ref, coeff_out_ref,
            coeff_acc):
    phase = pl.program_id(0)
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when((phase == 0) & (j == 0))
    def _init():
        coeff_acc[:, :] = jnp.zeros_like(coeff_acc)

    @pl.when(phase == 0)
    def _accumulate():
        # partial coefficients of this column tile: (m, T) x (T, 1) MXU
        # contraction (Mosaic requires 2-D operands)
        part = jax.lax.dot_general(
            V_ref[:, :].conj(),
            w_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=coeff_acc.dtype,
        )
        coeff_acc[:, :] += part * mask_ref[:, :]

    @pl.when(phase == 1)
    def _apply():
        # (m, 1)^T-contraction with (m, T): result (1, T)
        update = jax.lax.dot_general(
            coeff_acc[:, :],
            B_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=w_ref.dtype,
        )
        wout_ref[:, :] = w_ref[:, :] - update.astype(wout_ref.dtype)

        @pl.when(j == n_tiles - 1)
        def _emit_coeffs():
            coeff_out_ref[:, :] = coeff_acc[:, :]


def _fused_kernel(V_ref, w_ref, mask_ref, w1_ref, c1_out, c2_out,
                  c1_acc, c2_acc):
    """Two-phase part of the fused CGS2: phase 0 accumulates the
    first-pass coefficients; phase 1 re-reads each column slab ONCE from
    HBM and uses the VMEM-resident copy twice -- apply the first-pass
    update and project the updated vector for the second-pass
    coefficients.  Three total HBM sweeps of V per CGS2 iteration
    (together with :func:`_update_kernel`) instead of the four of two
    chained projection calls."""
    phase = pl.program_id(0)
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when((phase == 0) & (j == 0))
    def _init():
        c1_acc[:, :] = jnp.zeros_like(c1_acc)
        c2_acc[:, :] = jnp.zeros_like(c2_acc)

    @pl.when(phase == 0)
    def _first_pass_coeffs():
        part = jax.lax.dot_general(
            V_ref[:, :].conj(),
            w_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=c1_acc.dtype,
        )
        c1_acc[:, :] += part * mask_ref[:, :]

    @pl.when(phase == 1)
    def _update_and_second_coeffs():
        slab = V_ref[:, :]
        update = jax.lax.dot_general(
            c1_acc[:, :],
            slab,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=w_ref.dtype,
        )
        w1 = w_ref[:, :] - update.astype(w_ref.dtype)
        w1_ref[:, :] = w1
        part = jax.lax.dot_general(
            slab.conj(),
            w1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=c2_acc.dtype,
        )
        c2_acc[:, :] += part * mask_ref[:, :]

        @pl.when(j == n_tiles - 1)
        def _emit():
            c1_out[:, :] = c1_acc[:, :]
            c2_out[:, :] = c2_acc[:, :]


def _update_kernel(V_ref, w_ref, c_ref, wout_ref):
    """Final sweep of the fused CGS2: ``w2 = w1 - c2^T V``."""
    update = jax.lax.dot_general(
        c_ref[:, :],
        V_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=w_ref.dtype,
    )
    wout_ref[:, :] = w_ref[:, :] - update.astype(wout_ref.dtype)


def _divide_block(N, block_n):
    """Largest lane-friendly divisor of N not above block_n (or None)."""
    if N % block_n == 0:
        return block_n
    best = None
    for cand in range(min(block_n, N), 0, -1):
        if N % cand == 0:
            best = cand
            break
    if best is not None and best < 128 and N > 128:
        return None
    return best


def _vmem_block(N, rows, block_n, itemsize=4):
    """Column-tile size: large enough that the per-grid-step DMA
    amortizes the fixed step overhead (a 4096-wide tile moves ~0.7 MB
    in ~1 us -- pure overhead), small enough that the double-buffered
    slab pair stays well inside the ~16 MB VMEM."""
    budget = 6 * 1024 * 1024  # bytes per in-flight slab
    cap = max(128, budget // (itemsize * max(rows, 1)))
    return _divide_block(N, min(block_n, cap))


@functools.partial(
    jax.jit, static_argnames=("rows", "block_n", "interpret")
)
def cgs2_fused(V, w, mask, *, rows=None, block_n=32768, interpret=False):
    """Fused two-pass (CGS2) orthogonalization in THREE HBM sweeps of V.

    The BlockSpec reads only the leading ``rows`` rows of each column
    tile straight from HBM -- a prefix sweep with NO materialized
    prefix copy (an XLA-level ``V[:rows]`` slice feeding a dot copies
    the prefix, which costs more than it saves).

    :param V: basis rows, shape ``(m, N)``; only the first ``rows`` rows
      are swept (static prefix bucket; defaults to all m).
    :param w: vector to orthogonalize, shape ``(N,)``.
    :param mask: per-row multiplier, shape ``(m,)``.
    :param rows: static number of leading rows to sweep.
    :param block_n: column-tile upper bound; the effective tile is
      VMEM-aware (see :func:`_vmem_block`).
    :return: ``(w_orth, coeffs)`` with ``coeffs = c1 + c2`` of length m.
    """
    m, N = V.shape
    rows = m if rows is None else int(rows)
    bn = _vmem_block(N, rows, block_n, jnp.dtype(V.dtype).itemsize)
    if bn is None:
        raise ValueError(
            f"no lane-friendly block divides N={N}; use the jnp path"
        )
    n_tiles = N // bn

    w2d = w[None, :]
    maskr = mask[:rows, None].astype(
        jnp.result_type(V.dtype, jnp.float32)
    )

    w1, c1, c2 = pl.pallas_call(
        _fused_kernel,
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec((rows, bn), lambda p, j: (jnp.int32(0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda p, j: (jnp.int32(0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1),
                         lambda p, j: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn), lambda p, j: (jnp.int32(0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1),
                         lambda p, j: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1),
                         lambda p, j: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), w.dtype),
            jax.ShapeDtypeStruct((rows, 1), w.dtype),
            jax.ShapeDtypeStruct((rows, 1), w.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, 1), w.dtype),
            pltpu.VMEM((rows, 1), w.dtype),
        ],
        interpret=interpret,
    )(V, w2d, maskr)

    wout = pl.pallas_call(
        _update_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, bn), lambda j: (jnp.int32(0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (jnp.int32(0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda j: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j: (jnp.int32(0), j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), w.dtype),
        interpret=interpret,
    )(V, w1, c2)

    coeffs = (c1 + c2)[:, 0]
    if rows < m:
        coeffs = jnp.pad(coeffs, (0, m - rows))
    return wout[0], coeffs


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def cgs_project(V, w, mask, basis=None, *, block_n=16384, interpret=False):
    """One classical Gram-Schmidt projection pass.

    :param V: basis rows, shape ``(m, N)``.
    :param w: vector to orthogonalize, shape ``(N,)``.
    :param mask: per-row multiplier, shape ``(m,)`` (1.0 for active basis
      rows, 0.0 beyond the current iteration).
    :param basis: rows to subtract along (default ``V``; pass the dual
      basis P when a preconditioner M maintains ``V = M P``).
    :param block_n: column-tile upper bound (VMEM-aware; two slabs --
      V and the dual basis -- are in flight per step).
    :return: ``(w_orth, coeffs)``.
    """
    B = V if basis is None else basis
    m, N = V.shape
    block_n = _vmem_block(
        N, 2 * m, block_n, jnp.dtype(V.dtype).itemsize
    ) or 128
    if N % block_n != 0:
        # fall back to a lane-aligned divisor
        block_n = min(block_n, N)
        while N % block_n != 0:
            block_n //= 2
        block_n = max(block_n, 1)
    n_tiles = N // block_n

    w2 = w[None, :]
    mask2 = mask[:, None].astype(jnp.result_type(V.dtype, jnp.float32))

    grid = (2, n_tiles)
    wout, coeffs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (m, block_n), lambda p, j: (jnp.int32(0), j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, block_n), lambda p, j: (jnp.int32(0), j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_n), lambda p, j: (jnp.int32(0), j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, 1), lambda p, j: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, block_n), lambda p, j: (jnp.int32(0), j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, 1), lambda p, j: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), w.dtype),
            jax.ShapeDtypeStruct((m, 1), w.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((m, 1), w.dtype)],
        interpret=interpret,
    )(V, B, w2, mask2)
    return wout[0], coeffs[:, 0]
