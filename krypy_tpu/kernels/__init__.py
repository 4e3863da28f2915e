"""Pallas TPU kernels for the solver hot paths.

The reference's "native layer" is BLAS under numpy (SURVEY.md L0); here it
is custom TPU kernels:

* :mod:`~krypy_tpu.kernels.stencil` -- 5-point Laplacian matvec with
  in-kernel halo handling: one HBM read + one write per application,
  instead of the pad/shift temporaries of the lowered jnp formulation.
* :mod:`~krypy_tpu.kernels.orthogonalize` -- fused blocked classical
  Gram-Schmidt projection: coefficient contraction and basis update in a
  single two-phase kernel, keeping the iteration vector in VMEM between
  the passes.

All kernels run in interpreter mode off-TPU, which is how the CPU test
suite validates them.
"""

from .orthogonalize import cgs_project
from .stencil import laplacian_2d_kernel

__all__ = ["cgs_project", "laplacian_2d_kernel"]
