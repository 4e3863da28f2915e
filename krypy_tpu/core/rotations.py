"""Householder reflections and Givens rotations, complex-safe.

Reference: krypy/utils.py:332-436.  Both are provided in two forms:

* object form (``House``, ``Givens``) mirroring the reference API for the
  eager compatibility lane and tests;
* pure-function form (``givens_coeffs``, ``house_vector``) usable inside
  jitted solver cores where data-dependent branching must become ``where``.
"""

import numpy as np
import jax.numpy as jnp

from ..errors import ArgumentError

__all__ = [
    "House",
    "Givens",
    "givens_coeffs",
    "givens_coeffs_host",
    "house_vector",
]


def _safe_div(a, b):
    """a / b with 0/0 -> 0 (used for direction factors of zero vectors)."""
    return jnp.where(b == 0, 0.0 * a, a / jnp.where(b == 0, 1.0, b))


def house_vector(x):
    """Compute Householder data for a 1-D vector ``x``.

    Returns ``(v, beta, alpha, xnorm)`` such that
    :math:`(I - \\beta v v^*) x = \\alpha^{-1}\\;?` -- precisely, with
    ``H = I - beta v v^*``, it holds ``H x = alpha * xnorm * e_1`` with
    ``|alpha| = 1`` and ``v`` normalized.  Combination of Golub & Van Loan
    alg. 5.1.1 with the complex treatment of sec. 5.1.13 (as in the
    reference, krypy/utils.py:332-377), expressed branch-free so it can be
    traced.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    gamma = x[0]
    abs_gamma = jnp.abs(gamma)
    if n == 1:
        sigma = jnp.zeros((), dtype=abs_gamma.dtype)
    else:
        sigma = jnp.linalg.norm(x[1:], 2)
    xnorm = jnp.sqrt(abs_gamma**2 + sigma**2)

    one = jnp.ones((), dtype=x.dtype)
    direction = _safe_div(gamma, abs_gamma.astype(x.dtype))
    # direction of gamma, with the phase of 0 resolved as +1 resp. -1
    sign_pos = jnp.where(abs_gamma == 0, one, direction)
    sign_neg = jnp.where(abs_gamma == 0, -one, direction)

    tail_zero = sigma == 0
    # if the tail is zero the reflection degenerates to the identity
    beta = jnp.where(tail_zero, 0.0, 2.0)
    alpha = jnp.where(tail_zero, sign_pos, -sign_neg)
    v0 = jnp.where(tail_zero, one, gamma + sign_neg * xnorm.astype(x.dtype))
    v = jnp.concatenate([v0[None], x[1:]]) if n > 1 else v0[None]
    vnorm = jnp.sqrt(jnp.abs(v0) ** 2 + sigma**2)
    v = _safe_div(v, vnorm.astype(v.dtype))
    return v, beta, alpha, jnp.where(tail_zero, abs_gamma, xnorm)


class House:
    """Householder transformation with :math:`Hx = \\alpha\\|x\\|_2 e_1`,
    :math:`|\\alpha| = 1` (reference: krypy/utils.py:332-402)."""

    def __init__(self, x):
        x = jnp.asarray(x)
        if x.ndim != 2 or x.shape[1] != 1:
            raise ArgumentError("x is not a vector of dim (N,1)")
        v, beta, alpha, xnorm = house_vector(x[:, 0])
        self.v = v[:, None]
        self.beta = beta
        self.alpha = alpha
        self.xnorm = xnorm

    def apply(self, x):
        """Apply the transformation to an ``(N, m)`` block."""
        x = jnp.asarray(x)
        if x.ndim != 2:
            raise ArgumentError("x is not a matrix of shape (N,*)")
        return x - self.beta * self.v * jnp.dot(self.v.conj().T, x)

    def matrix(self):
        """Dense matrix :math:`I - \\beta v v^*` (testing only)."""
        n = self.v.shape[0]
        return jnp.eye(n, dtype=self.v.dtype) - self.beta * jnp.dot(
            self.v, self.v.conj().T
        )


def givens_coeffs(a, b):
    """Compute ``(c, s, r)`` with real :math:`c \\ge 0` such that

    .. math::
        \\begin{bmatrix} c & s \\\\ -\\bar s & c \\end{bmatrix}
        \\begin{bmatrix} a \\\\ b \\end{bmatrix}
        = \\begin{bmatrix} r \\\\ 0 \\end{bmatrix}.

    Branch-free, complex-safe formulation (LAPACK ``zrotg``-style convention,
    replacing the reference's BLAS call at krypy/utils.py:424-427).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    abs_a = jnp.abs(a)
    abs_b = jnp.abs(b)
    denom = jnp.sqrt(abs_a**2 + abs_b**2)

    # b == 0: identity rotation.
    # a == 0, b != 0: swap.
    sign_a = jnp.where(abs_a == 0, 1.0 + 0.0 * a, _safe_div(a, abs_a))
    c = jnp.where(denom == 0, 1.0, _safe_div(abs_a, denom))
    c = jnp.where((abs_b == 0), 1.0, c)
    s = jnp.where(
        abs_b == 0,
        0.0 * a,
        jnp.where(
            abs_a == 0,
            _safe_div(jnp.conj(b), abs_b),
            sign_a * _safe_div(jnp.conj(b), denom),
        ),
    )
    r = jnp.where(
        abs_b == 0,
        a,
        jnp.where(abs_a == 0, abs_b.astype(a.dtype), sign_a * denom),
    )
    return c, s, r


def givens_coeffs_host(a, b):
    """Host (numpy scalar) version of :func:`givens_coeffs` for the
    sequential QR-update control path of MINRES/GMRES, which runs on host
    while the N-dimensional data stays on device."""
    a = complex(a) if np.iscomplexobj(a) or isinstance(a, complex) else float(a)
    b = complex(b) if np.iscomplexobj(b) or isinstance(b, complex) else float(b)
    abs_a, abs_b = abs(a), abs(b)
    if abs_b == 0:
        return 1.0, 0.0 * b, a
    if abs_a == 0:
        return 0.0, np.conj(b) / abs_b, abs_b + 0.0 * a
    denom = np.sqrt(abs_a**2 + abs_b**2)
    sign_a = a / abs_a
    c = abs_a / denom
    s = sign_a * np.conj(b) / denom
    r = sign_a * denom
    return c, s, r


class Givens:
    """2x2 rotation zeroing the second component of a vector
    (reference: krypy/utils.py:405-436).

    The rotation parameters are small control data; they are computed and
    stored on host (numpy).  ``apply`` accepts numpy or jnp input and stays
    in the input's array lane.
    """

    def __init__(self, x):
        x = np.asarray(x)
        if x.shape != (2, 1):
            raise ArgumentError("x is not a vector of shape (2,1)")
        a, b = x[0, 0], x[1, 0]
        c, s, r = givens_coeffs_host(a, b)
        self.c = c
        self.s = s
        self.r = r
        self.G = np.array([[c, s], [-np.conj(s), c]])

    def apply(self, x):
        if isinstance(x, jnp.ndarray):
            return jnp.dot(jnp.asarray(self.G), x)
        return np.dot(self.G, np.asarray(x))
