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

__all__ = ["cgs_project"]


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


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def cgs_project(V, w, mask, basis=None, *, block_n=2048, interpret=False):
    """One classical Gram-Schmidt projection pass.

    :param V: basis rows, shape ``(m, N)``.
    :param w: vector to orthogonalize, shape ``(N,)``.
    :param mask: per-row multiplier, shape ``(m,)`` (1.0 for active basis
      rows, 0.0 beyond the current iteration).
    :param basis: rows to subtract along (default ``V``; pass the dual
      basis P when a preconditioner M maintains ``V = M P``).
    :param block_n: column tile size (lane-aligned).
    :return: ``(w_orth, coeffs)``.
    """
    B = V if basis is None else basis
    m, N = V.shape
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
