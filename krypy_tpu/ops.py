"""TPU-native operator gallery.

Matrix-free matvecs for the benchmark/test problems of BASELINE.md (the
reference has no operator gallery; its extensibility hook is the
LinearOperator protocol, krypy/utils.py:1365 -- these are the TPU-first
equivalents).  All operators are pure functions on 1-D ``(N,)`` vectors:

* stencils are expressed as pad/slice/add pipelines that XLA fuses into a
  single VPU pass, and that GSPMD turns into halo exchanges when the grid
  axis is sharded over a mesh;
* diagonal operators are elementwise multiplies;
* explicit sparse matrices use ``jax.experimental.sparse`` (BCOO).
"""

import numpy as np
import jax.numpy as jnp

__all__ = [
    "diagonal",
    "poisson_1d",
    "poisson_2d",
    "convection_diffusion_2d",
    "shifted_laplacian_2d",
    "jacobi_preconditioner",
    "nls_jacobian_sequence",
    "readme_diag",
    "sparse_from_scipy",
]


def diagonal(d):
    """diag(d) as a matvec; ``d`` has shape ``(N,)``."""
    d = jnp.asarray(d)

    def matvec(x):
        return d * x

    matvec.diag = d
    matvec.shape = (d.shape[0], d.shape[0])
    return matvec


def readme_diag(n=100):
    """The README example operator A = diag(1e-3, 2, 3, ..., n)
    (reference: README.md:43-48, example.py:12-16)."""
    d = jnp.concatenate(
        [jnp.array([1.0e-3]), jnp.arange(2.0, n + 1)]
    )
    return diagonal(d)


def _lap1d_apply(u, h2):
    """1-D central second difference with Dirichlet boundaries."""
    left = jnp.pad(u[:-1], (1, 0))
    right = jnp.pad(u[1:], (0, 1))
    return (2.0 * u - left - right) / h2


def poisson_1d(n):
    """1-D Dirichlet Laplacian on n interior points of (0,1); SPD."""
    h2 = (1.0 / (n + 1)) ** 2

    def matvec(x):
        return _lap1d_apply(x, h2)

    matvec.shape = (n, n)
    matvec.diag = jnp.full(n, 2.0 / h2)
    return matvec


def poisson_2d(nx, ny=None):
    """5-point Laplacian on an nx x ny interior grid of the unit square,
    Dirichlet boundaries; SPD, N = nx*ny.

    The matvec reshapes the flat vector to the grid, applies the stencil
    as shifted adds (one fused VPU pass), and flattens back.  Sharding the
    flat axis blocks the grid row-wise; GSPMD inserts halo collectives.
    """
    ny = nx if ny is None else ny
    hx2 = (1.0 / (nx + 1)) ** 2
    hy2 = (1.0 / (ny + 1)) ** 2

    def matvec(x):
        u = x.reshape(nx, ny)
        ux = (2.0 * u
              - jnp.pad(u[:-1, :], ((1, 0), (0, 0)))
              - jnp.pad(u[1:, :], ((0, 1), (0, 0)))) / hx2
        uy = (2.0 * u
              - jnp.pad(u[:, :-1], ((0, 0), (1, 0)))
              - jnp.pad(u[:, 1:], ((0, 0), (0, 1)))) / hy2
        return (ux + uy).reshape(-1)

    matvec.shape = (nx * ny, nx * ny)
    matvec.diag = jnp.full(nx * ny, 2.0 / hx2 + 2.0 / hy2)
    return matvec


def convection_diffusion_2d(nx, ny=None, wind=(1.0, 0.5), eps=1.0):
    """Nonsymmetric convection-diffusion operator
    ``-eps * Lap(u) + w . grad(u)`` with first-order upwind convection;
    the BASELINE config-3 operator."""
    ny = nx if ny is None else ny
    hx = 1.0 / (nx + 1)
    hy = 1.0 / (ny + 1)
    wx, wy = wind
    lap = poisson_2d(nx, ny)

    def matvec(x):
        u = x.reshape(nx, ny)
        # upwind differences (wind components assumed non-negative)
        dux = (u - jnp.pad(u[:-1, :], ((1, 0), (0, 0)))) / hx
        duy = (u - jnp.pad(u[:, :-1], ((0, 0), (1, 0)))) / hy
        conv = wx * dux + wy * duy
        return eps * lap(x) + conv.reshape(-1)

    matvec.shape = (nx * ny, nx * ny)
    matvec.diag = eps * lap.diag + wx / hx + wy / hy
    return matvec


def shifted_laplacian_2d(nx, ny=None, sigma=0.0):
    """Shifted Laplacian ``Lap - sigma I`` (indefinite for sigma inside
    the spectrum); the BASELINE config-4 operator."""
    lap = poisson_2d(nx, ny)

    def matvec(x):
        return lap(x) - sigma * x

    matvec.shape = lap.shape
    matvec.diag = lap.diag - sigma
    return matvec


def jacobi_preconditioner(op_or_diag):
    """Jacobi (diagonal) preconditioner M = diag(A)^{-1} from an operator
    exposing ``.diag`` or from an explicit diagonal."""
    d = getattr(op_or_diag, "diag", None)
    if d is None:
        d = jnp.asarray(op_or_diag)
    inv = 1.0 / d

    def matvec(x):
        return inv * x

    matvec.diag = inv
    matvec.shape = (d.shape[0], d.shape[0])
    return matvec


def nls_jacobian_sequence(n, n_sys=5, kappa=1.0, seed=0):
    """A sequence of Jacobian-like SPD operators
    ``J_i = Lap_1d + diag(1 + 3 kappa psi_i^2)`` mimicking Newton steps on
    a nonlinear Schrödinger-type equation; the BASELINE config-5 sequence
    of slowly varying systems for recycling benchmarks."""
    lap = poisson_1d(n)
    rng = np.random.RandomState(seed)
    xs = np.linspace(0, 1, n)
    psi = np.exp(-40 * (xs - 0.5) ** 2)
    ops = []
    for i in range(n_sys):
        psi_i = psi * (1.0 + 0.05 * i) + 0.01 * rng.randn(n) * i
        d = jnp.asarray(1.0 + 3.0 * kappa * psi_i**2)

        def matvec(x, _d=d):
            return lap(x) + _d * x

        matvec.shape = (n, n)
        matvec.diag = lap.diag + d
        ops.append(matvec)
    return ops


def sparse_from_scipy(A):
    """Convert a scipy sparse matrix into a BCOO-backed matvec."""
    from jax.experimental import sparse as jsparse

    coo = A.tocoo()
    mat = jsparse.BCOO(
        (
            jnp.asarray(coo.data),
            jnp.column_stack(
                [jnp.asarray(coo.row), jnp.asarray(coo.col)]
            ),
        ),
        shape=coo.shape,
    )

    def matvec(x):
        return mat @ x

    matvec.shape = coo.shape
    return matvec
