"""Core numerical kernels: operators, inner products, rotations,
projections, QR, timers."""

from . import dtypes, operators, products, projections, qr, rotations, timers  # noqa: F401
