"""Linear systems and Krylov solvers (reference-compatible lane).

Mirrors the semantics of ``krypy.linsys`` (reference: krypy/linsys.py):
:class:`LinearSystem` describes the preconditioned system
:math:`M M_l A M_r y = M M_l b`, :math:`x = M_r y`; the solver classes run
the solve on construction and expose ``xk``/``resnorms``/``errnorms``.

This lane executes eagerly on JAX arrays (each operator application is an
XLA dispatch); it supports arbitrary Python-side operators, callable inner
products and the full explicit-residual bookkeeping of the reference.  For
the compile-once ``lax.while_loop`` solvers used in production and
benchmarks, see :mod:`krypy_tpu.functional` -- both lanes share the same
numerics and are cross-checked in the test-suite.
"""

import warnings

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from . import utils
from .errors import ArgumentError, ConvergenceError

__all__ = [
    "LinearSystem",
    "TimedLinearSystem",
    "ConvertedTimedLinearSystem",
    "Cg",
    "Minres",
    "Gmres",
    "RestartedGmres",
]


class LinearSystem:
    r"""A (preconditioned) linear system

    .. math::
        M M_l A M_r y = M M_l b, \qquad x = M_r y.

    :param A: linear operator on :math:`\mathbb{C}^N` (anything accepted by
      :func:`~krypy_tpu.utils.get_linearoperator`).
    :param b: right hand side with ``b.shape in {(N,), (N,1)}``.
    :param M: (optional) self-adjoint positive-definite preconditioner;
      changes the inner product to
      :math:`\langle x, y\rangle_M = \langle M x, y\rangle`.
    :param Minv: (optional) inverse of M; needed for deflation/Ritz.
    :param Ml: (optional) left preconditioner.
    :param Mr: (optional) right preconditioner.
    :param ip_B: (optional) inner product (matrix, operator, or jittable
      callable), see :func:`~krypy_tpu.utils.inner`.
    :param normal: is :math:`M_l A M_r` normal w.r.t. ``ip_B``?
    :param self_adjoint: is :math:`M_l A M_r` self-adjoint w.r.t. ``ip_B``?
      (implies ``normal``).
    :param positive_definite: is :math:`M_l A M_r` positive definite?
    :param exact_solution: (optional) known solution for error tracking.

    Reference: krypy/linsys.py:11-201.
    """

    def __init__(
        self,
        A,
        b,
        M=None,
        Minv=None,
        Ml=None,
        Mr=None,
        ip_B=None,
        normal=None,
        self_adjoint=False,
        positive_definite=False,
        exact_solution=None,
    ):
        self.N = N = b.shape[0]
        shape = (N, N)

        self.A = utils.get_linearoperator(shape, A)
        self.M = utils.get_linearoperator(shape, M)
        self.Minv = utils.get_linearoperator(shape, Minv)
        self.Ml = utils.get_linearoperator(shape, Ml)
        self.Mr = utils.get_linearoperator(shape, Mr)
        self.MlAMr = self.Ml * self.A * self.Mr
        if ip_B is None or isinstance(ip_B, utils.LinearOperator) or hasattr(
            ip_B, "shape"
        ):
            self.ip_B = utils.get_linearoperator(shape, ip_B)
        else:
            self.ip_B = ip_B  # jittable callable

        self.flat_vecs, (self.b, self.exact_solution) = utils.shape_vecs(
            b, exact_solution
        )

        self.self_adjoint = self_adjoint
        if self_adjoint:
            if normal is not None and not normal:
                warnings.warn(
                    "Setting normal=True because self_adjoint=True is "
                    "provided."
                )
            normal = True
        self.normal = bool(normal) if normal is not None else False
        self.positive_definite = positive_definite
        if self_adjoint and not self.normal:
            raise ArgumentError("self-adjointness implies normality")

        self.dtype = utils.find_common_dtype(
            self.A, self.b, self.M, self.Ml, self.Mr,
            self.ip_B if isinstance(self.ip_B, utils.LinearOperator) else None,
        )

        # norm of the (preconditioned) right hand side:  ||M Ml b||_{M^{-1}}
        self.Mlb = self.Ml * self.b
        self.MMlb = self.M * self.Mlb
        self.MMlb_norm = utils.norm(self.Mlb, self.MMlb, ip_B=self.ip_B)

    def get_residual(self, z, compute_norm=False):
        r"""Residual :math:`r = M M_l (b - A z)` (and optionally its
        :math:`M^{-1}`-norm) for an approximate solution ``z``
        (reference: krypy/linsys.py:130-161)."""
        if z is None:
            if compute_norm:
                return self.MMlb, self.Mlb, self.MMlb_norm
            return self.MMlb, self.Mlb
        r = self.b - self.A * z
        Mlr = self.Ml * r
        MMlr = self.M * Mlr
        if compute_norm:
            return MMlr, Mlr, utils.norm(Mlr, MMlr, ip_B=self.ip_B)
        return MMlr, Mlr

    def get_ip_Minv_B(self):
        r"""The inner product implicitly used with the preconditioner M:
        :math:`\langle x, y\rangle_{M^{-1}} = x^* B M^{-1} y`
        (reference: krypy/linsys.py:163-176).

        Note: the reference's operator branch returns ``Minv * ip_B``
        (i.e. :math:`x^* M^{-1} B y`), which is not a Hermitian form when
        M and B do not commute, while its callable branch computes the
        correct :math:`x^* B M^{-1} y`.  We use the Hermitian orientation
        in both branches.
        """
        if not isinstance(self.M, utils.IdentityLinearOperator):
            if isinstance(self.Minv, utils.IdentityLinearOperator):
                raise ArgumentError(
                    "Minv has to be provided for the evaluation of the inner "
                    "product that is implicitly defined by M."
                )
            if isinstance(self.ip_B, utils.LinearOperator):
                return self.ip_B * self.Minv
            return lambda x, y: self.ip_B(x, self.Minv * y)
        return self.ip_B

    def __repr__(self):
        parts = ["LinearSystem {"]
        for k in (
            "A", "b", "M", "Minv", "Ml", "Mr", "ip_B",
            "normal", "self_adjoint", "positive_definite", "exact_solution",
        ):
            op = getattr(self, k, None)
            if op is not None and not isinstance(
                op, utils.IdentityLinearOperator
            ):
                parts.append(f"  {k}: {op!r}")
        return "\n".join(parts) + "\n}"


class TimedLinearSystem(LinearSystem):
    """A :class:`LinearSystem` whose operators record application timings
    into a shared :class:`~krypy_tpu.utils.Timings` registry (reference:
    krypy/linsys.py:204-252)."""

    def __init__(
        self,
        A,
        b,
        M=None,
        Minv=None,
        Ml=None,
        Mr=None,
        ip_B=None,
        normal=None,
        self_adjoint=False,
        positive_definite=False,
        exact_solution=None,
    ):
        self.timings = utils.Timings()
        N = b.shape[0]
        shape = (N, N)

        if ip_B is None or isinstance(ip_B, utils.LinearOperator) or hasattr(
            ip_B, "shape"
        ):
            _ip_B = utils.get_linearoperator(
                shape, ip_B, timer=self.timings["ip_B"]
            )
        else:
            def _ip_B(X, Y, _ip=ip_B):
                m = X.shape[1]
                n = Y.shape[1]
                if m == 0 or n == 0:
                    return _ip(X, Y)
                with self.timings["ip_B"]:
                    ret = _ip(X, Y)
                self.timings["ip_B"][-1] /= m * n
                return ret

        super().__init__(
            A=utils.get_linearoperator(shape, A, self.timings["A"]),
            b=b,
            M=utils.get_linearoperator(shape, M, self.timings["M"]),
            Minv=utils.get_linearoperator(shape, Minv, self.timings["Minv"]),
            Ml=utils.get_linearoperator(shape, Ml, self.timings["Ml"]),
            Mr=utils.get_linearoperator(shape, Mr, self.timings["Mr"]),
            ip_B=_ip_B,
            normal=normal,
            self_adjoint=self_adjoint,
            positive_definite=positive_definite,
            exact_solution=exact_solution,
        )


class ConvertedTimedLinearSystem(TimedLinearSystem):
    """Upgrade an existing :class:`LinearSystem` to a timed one
    (reference: krypy/linsys.py:255-274)."""

    def __init__(self, linear_system):
        kwargs = {
            k: getattr(linear_system, k)
            for k in (
                "A", "b", "M", "Minv", "Ml", "Mr", "ip_B",
                "normal", "self_adjoint", "positive_definite",
                "exact_solution",
            )
        }
        super().__init__(**kwargs)


class _KrylovSolver:
    """Common lifecycle of all Krylov solvers: argument handling, initial
    residual, per-iteration residual bookkeeping (updated vs. explicit),
    tolerance/maxiter policy (reference: krypy/linsys.py:277-517).

    The solve runs in the constructor.  Attributes on completion:

    * ``xk`` -- approximate solution,
    * ``resnorms`` -- relative residual norms per iteration,
    * ``errnorms`` -- error norms (if ``exact_solution`` given),
    * ``V``, ``H`` (, ``P``) -- Krylov data (if ``store_arnoldi=True``).
    """

    def __init__(
        self,
        linear_system,
        x0=None,
        tol=1e-5,
        maxiter=None,
        explicit_residual=False,
        store_arnoldi=False,
        dtype=None,
    ):
        if not isinstance(linear_system, LinearSystem):
            raise ArgumentError(
                "linear_system is not an instance of LinearSystem"
            )
        self.linear_system = linear_system
        N = linear_system.N
        self.maxiter = N if maxiter is None else maxiter
        self.flat_vecs, (self.x0,) = utils.shape_vecs(x0)
        self.explicit_residual = explicit_residual
        self.store_arnoldi = store_arnoldi

        self.x0 = self._get_initial_guess(self.x0)
        self.MMlr0, self.Mlr0, self.MMlr0_norm = self._get_initial_residual(
            self.x0
        )
        if self.x0 is None:
            self.x0 = jnp.zeros((N, 1))
        self.tol = tol
        self.xk = None

        self.dtype = np.promote_types(
            utils.find_common_dtype(self.x0, dtype),
            linear_system.dtype,
        )

        # the operator the iteration actually runs on; deflation wraps it
        self.MlAMr = linear_system.MlAMr

        self.iter = 0
        self.resnorms = []

        if float(self.linear_system.MMlb_norm) == 0:
            # rhs is exactly zero: return the zero solution
            self.xk = self.x0 = jnp.zeros((N, 1))
            self.resnorms.append(0.0)
        else:
            self.resnorms.append(
                float(self.MMlr0_norm / self.linear_system.MMlb_norm)
            )

        if self.linear_system.exact_solution is not None:
            self.errnorms = []
            self.errnorms.append(
                float(
                    utils.norm(
                        self.linear_system.exact_solution - self._get_xk(None),
                        ip_B=self.linear_system.ip_B,
                    )
                )
            )

        self._solve()
        self._finalize()

    # -- hooks (overridden by deflation) ---------------------------------
    def _get_initial_guess(self, x0):
        return x0

    def _get_initial_residual(self, x0):
        return self.linear_system.get_residual(x0, compute_norm=True)

    def _get_xk(self, yk):
        if yk is not None:
            return self.x0 + self.linear_system.Mr * yk
        return self.x0

    # -- residual bookkeeping --------------------------------------------
    def _finalize_iteration(self, yk, resnorm):
        """Track error/residual norms for the current iterate; enforce the
        updated-vs-explicit residual policy (reference:
        krypy/linsys.py:430-493).

        :return: the explicit residual norm if it was computed, else None.
        """
        self.xk = None
        ls = self.linear_system

        if ls.exact_solution is not None:
            self.xk = self._get_xk(yk)
            self.errnorms.append(
                float(
                    utils.norm(
                        ls.exact_solution - self.xk, ip_B=ls.ip_B
                    )
                )
            )

        rkn = None
        resnorm = float(resnorm)
        rel = resnorm / float(ls.MMlb_norm)

        # compute the explicit residual if requested, if the updated residual
        # indicates convergence, or on the last iteration
        if (
            self.explicit_residual
            or rel <= self.tol
            or self.iter + 1 == self.maxiter
        ):
            if self.xk is None:
                self.xk = self._get_xk(yk)
            _, _, rkn = ls.get_residual(self.xk, compute_norm=True)
            rkn = float(rkn)
            self.resnorms.append(rkn / float(ls.MMlb_norm))

            if self.resnorms[-1] > self.tol:
                if self.iter + 1 == self.maxiter:
                    self._finalize()
                    raise ConvergenceError(
                        "No convergence in last iteration "
                        f"(maxiter: {self.maxiter}, "
                        f"residual: {self.resnorms[-1]}).",
                        self,
                    )
                if not self.explicit_residual and rel <= self.tol:
                    warnings.warn(
                        "updated residual is below tolerance, explicit "
                        "residual is NOT! "
                        f"(upd={resnorm} <= tol={self.tol} < "
                        f"exp={self.resnorms[-1]})"
                    )
        else:
            self.resnorms.append(rel)

        return rkn

    def _finalize(self):
        pass

    @staticmethod
    def operations(nsteps):
        """Analytic operation-count model for ``nsteps`` iterations; keys
        match the :class:`~krypy_tpu.utils.Timings` registry."""
        raise NotImplementedError(
            "operations() has to be overridden by the derived solver class."
        )

    def _solve(self):
        raise NotImplementedError(
            "_solve has to be overridden by the derived solver class."
        )



def _solver_repr(solver, name):
    """Compact state dump (reference observability: the per-solver
    __repr__ blocks, krypy/linsys.py:574-591/771-789/919-938)."""
    lines = [f"krypy_tpu {name} object"]
    lines.append(f"    tol: {solver.tol}")
    lines.append(f"    maxiter: {solver.maxiter}")
    lines.append(f"    iter: {solver.iter}")
    lines.append(f"    explicit residual: {solver.explicit_residual}")
    lines.append(f"    store_arnoldi: {solver.store_arnoldi}")
    if solver.resnorms:
        lines.append(
            f"    resnorms: [{solver.resnorms[0]}, ..., "
            f"{solver.resnorms[-1]}]"
        )
    if solver.xk is not None:
        import numpy as _np

        xk = _np.asarray(solver.xk)
        lines.append(f"    xk: [{xk[0]}, ..., {xk[-1]}]")
    return "\n".join(lines)


class Cg(_KrylovSolver):
    r"""Preconditioned conjugate gradient method.

    Requires :math:`M_l A M_r` self-adjoint and positive definite w.r.t.
    ``ip_B``; minimizes the :math:`A`-norm of the error over
    :math:`x_0 + M_r K_k(M M_l A M_r, r_0)` via the coupled two-term
    recurrence.  Memory: 3 vectors (6 with M).  Reference:
    krypy/linsys.py:520-708.
    """

    def __init__(self, linear_system, **kwargs):
        if (
            not linear_system.self_adjoint
            or not linear_system.positive_definite
        ):
            warnings.warn(
                "Cg applied to a non-self-adjoint or non-definite linear "
                "system. Consider using Minres or Gmres."
            )
        super().__init__(linear_system, **kwargs)

    def __repr__(self):
        return _solver_repr(self, "CG")

    def _solve(self):
        N = self.linear_system.N
        ls = self.linear_system
        yk = jnp.zeros((N, 1), dtype=self.dtype)

        # squared residual norms; drives the direction updates
        self.rhos = rhos = [float(self.MMlr0_norm) ** 2]

        self.Mlrk = self.Mlr0
        self.MMlrk = self.MMlr0
        p = self.MMlrk
        self.iter = 0

        # Lanczos reconstruction state: basis columns on device, the
        # tridiagonal matrix on host
        if self.store_arnoldi:
            self._V_cols = []
            self._P_cols = []
            with_M = not isinstance(ls.M, utils.IdentityLinearOperator)
            if float(self.MMlr0_norm) > 0:
                self._V_cols.append(self.MMlr0 / self.MMlr0_norm)
                if with_M:
                    self._P_cols.append(self.Mlr0 / self.MMlr0_norm)
            self.H = np.zeros((self.maxiter + 1, self.maxiter))
            alpha_old = 0

        while self.resnorms[-1] > self.tol and self.iter < self.maxiter:
            k = self.iter
            if k > 0:
                omega = rhos[-1] / rhos[-2]
                p = self.MMlrk + omega * p
            Ap = self.MlAMr * p

            alpha = rhos[-1] / complex(
                utils.inner(p, Ap, ip_B=ls.ip_B)[0, 0]
            )
            if abs(alpha.imag) > 1e-12:
                warnings.warn(
                    f"Iter {k}: abs(alpha.imag) = {abs(alpha.imag)} > 1e-12. "
                    "Is your operator self-adjoint in the provided inner "
                    "product?"
                )
            alpha = alpha.real

            # reconstruct the Lanczos tridiagonal from the CG coefficients
            if self.store_arnoldi:
                if k > 0:
                    self.H[k - 1, k] = self.H[k, k - 1]
                    self.H[k, k] = (1.0 + alpha * omega / alpha_old) / alpha
                else:
                    self.H[k, k] = 1.0 / alpha

            yk = yk + alpha * p
            self.Mlrk = self.Mlrk - alpha * Ap
            self.MMlrk = ls.M * self.Mlrk

            MMlrk_norm = utils.norm(self.Mlrk, self.MMlrk, ip_B=ls.ip_B)
            rhos.append(float(MMlrk_norm) ** 2)

            if self.store_arnoldi:
                sign = (-1) ** (k + 1)
                self._V_cols.append(sign * self.MMlrk / MMlrk_norm)
                if not isinstance(ls.M, utils.IdentityLinearOperator):
                    self._P_cols.append(sign * self.Mlrk / MMlrk_norm)
                self.H[k + 1, k] = np.sqrt(rhos[-1] / rhos[-2]) / alpha
                alpha_old = alpha

            rkn = self._finalize_iteration(yk, MMlrk_norm)
            if rkn is not None:
                rhos[-1] = rkn**2
            self.iter += 1

        if self.xk is None:
            self.xk = self._get_xk(yk)

    def _finalize(self):
        super()._finalize()
        if self.store_arnoldi:
            # reference semantics: V has iter+1 columns, zero-padded if the
            # initial residual was exactly zero (krypy/linsys.py:693-696)
            N = self.linear_system.N

            def stack(cols):
                cols = cols[: self.iter + 1]
                pad = self.iter + 1 - len(cols)
                cols = list(cols) + [
                    jnp.zeros((N, 1), dtype=self.dtype)
                ] * pad
                return jnp.column_stack(cols)

            self.V = stack(self._V_cols)
            if self._P_cols:
                self.P = stack(self._P_cols)
            self.H = self.H[: self.iter + 1, : self.iter]

    @staticmethod
    def operations(nsteps):
        return {
            "A": 1 + nsteps,
            "M": 2 + nsteps,
            "Ml": 2 + nsteps,
            "Mr": 1 + nsteps,
            "ip_B": 2 + 2 * nsteps,
            "axpy": 2 + 2 * nsteps,
        }


class Minres(_KrylovSolver):
    r"""Preconditioned MINRES method.

    Requires :math:`M_l A M_r` self-adjoint w.r.t. ``ip_B``; minimizes the
    preconditioned residual norm via the Lanczos recurrence and an
    incremental QR by two lagged Givens rotations with a three-column
    solution recurrence.  Memory: 3 vectors (6 with M).  Reference:
    krypy/linsys.py:711-874.
    """

    def __init__(self, linear_system, ortho="lanczos", **kwargs):
        if not linear_system.self_adjoint:
            warnings.warn(
                "Minres applied to a non-self-adjoint linear system. "
                "Consider using Gmres."
            )
        self.ortho = ortho
        super().__init__(linear_system, **kwargs)

    def __repr__(self):
        return _solver_repr(self, "MINRES")

    def _solve(self):
        N = self.linear_system.N
        ls = self.linear_system

        self.lanczos = utils.Arnoldi(
            self.MlAMr,
            self.Mlr0,
            maxiter=self.maxiter,
            ortho=self.ortho,
            M=ls.M,
            Mv=self.MMlr0,
            Mv_norm=self.MMlr0_norm,
            ip_B=ls.ip_B,
        )

        # solution recurrence: last two W columns (device); all scalar QR
        # state (R column, rotations, projected rhs y) lives on host
        W = [jnp.zeros((N, 1), dtype=self.dtype) for _ in range(2)]
        y = np.array([[float(self.MMlr0_norm)], [0.0]])
        G2 = None  # previous Givens rotation
        G1 = None  # the one before that
        yk = jnp.zeros((N, 1), dtype=self.dtype)

        while (
            self.resnorms[-1] > self.tol
            and self.lanczos.iter < self.lanczos.maxiter
            and not self.lanczos.invariant
        ):
            k = self.iter = self.lanczos.iter
            self.lanczos.advance()
            H = self.lanczos.H  # host buffer

            # incremental QR of the tridiagonal: apply the two lagged
            # rotations to the new column, then compute a new one
            R = np.zeros((4, 1))
            if k > 0:
                R[1, 0] = np.real(H[k - 1, k])
            if G1 is not None:
                R[:2] = G1.apply(R[:2])
            R[2, 0] = np.real(H[k, k])
            R[3, 0] = np.real(H[k + 1, k])
            if G2 is not None:
                R[1:3] = G2.apply(R[1:3])
            G1 = G2
            G2 = utils.Givens(R[2:4])
            R[2, 0] = np.real(G2.r)
            R[3, 0] = 0.0
            y = G2.apply(y)

            # update solution
            v_k = self.lanczos.basis_vector(k)
            z = (v_k - R[0, 0] * W[0] - R[1, 0] * W[1]) / R[2, 0]
            W = [W[1], z]
            yk = yk + y[0, 0] * z
            y = np.array([[y[1, 0]], [0.0]])

            self._finalize_iteration(yk, abs(y[0, 0]))

        if self.xk is None:
            self.xk = self._get_xk(yk)

    def _finalize(self):
        super()._finalize()
        if self.store_arnoldi:
            if not isinstance(
                self.linear_system.M, utils.IdentityLinearOperator
            ):
                self.V, self.H, self.P = self.lanczos.get()
            else:
                self.V, self.H = self.lanczos.get()

    @staticmethod
    def operations(nsteps):
        return {
            "A": 1 + nsteps,
            "M": 2 + nsteps,
            "Ml": 2 + nsteps,
            "Mr": 1 + nsteps,
            "ip_B": 2 + 2 * nsteps,
            "axpy": 4 + 8 * nsteps,
        }


class Gmres(_KrylovSolver):
    r"""Preconditioned GMRES method.

    Full Arnoldi (``ortho='mgs'`` default) with a growing Givens QR of the
    Hessenberg matrix; the solution is reconstructed on demand by a
    triangular solve.  Memory: maxiter+1 vectors (2x with M).  Reference:
    krypy/linsys.py:877-1018.
    """

    def __init__(self, linear_system, ortho="mgs", **kwargs):
        self.ortho = ortho
        super().__init__(linear_system, **kwargs)

    def __repr__(self):
        return _solver_repr(self, "GMRES")

    def _get_xk(self, y):
        if y is None:
            return self.x0
        k = self.arnoldi.iter
        if k > 0:
            # host triangular solve of the k x k system, then one device
            # GEMV against the Krylov basis
            yy = scipy.linalg.solve_triangular(
                self.R[:k, :k], np.asarray(y[:k])
            )
            yk = jnp.dot(self.arnoldi.V[:, :k], jnp.asarray(yy))
            return self.x0 + self.linear_system.Mr * yk
        return self.x0

    def _solve(self):
        ls = self.linear_system
        self.arnoldi = utils.Arnoldi(
            self.MlAMr,
            self.Mlr0,
            maxiter=self.maxiter,
            ortho=self.ortho,
            M=ls.M,
            Mv=self.MMlr0,
            Mv_norm=self.MMlr0_norm,
            ip_B=ls.ip_B,
        )
        # Givens rotations + QR of the Hessenberg matrix: host state
        G = []
        self.R = np.zeros(
            (self.maxiter + 1, self.maxiter), dtype=self.dtype
        )
        y = np.zeros((self.maxiter + 1, 1), dtype=self.dtype)
        y[0, 0] = float(self.MMlr0_norm)

        while (
            self.resnorms[-1] > self.tol
            and self.arnoldi.iter < self.arnoldi.maxiter
            and not self.arnoldi.invariant
        ):
            k = self.iter = self.arnoldi.iter
            self.arnoldi.advance()

            # new Hessenberg column, rotated by all previous Givens
            self.R[:, [k]] = self.arnoldi.H[: self.maxiter + 1, [k]]
            for i in range(k):
                self.R[i: i + 2, [k]] = G[i].apply(self.R[i: i + 2, [k]])
            G.append(utils.Givens(self.R[k: k + 2, [k]]))
            self.R[k: k + 2, [k]] = G[k].apply(self.R[k: k + 2, [k]])
            y[k: k + 2] = G[k].apply(y[k: k + 2])

            self._finalize_iteration(y[: k + 1], abs(y[k + 1, 0]))

        if self.xk is None:
            self.xk = self._get_xk(y[: self.arnoldi.iter])

    def _finalize(self):
        super()._finalize()
        if self.store_arnoldi:
            if not isinstance(
                self.linear_system.M, utils.IdentityLinearOperator
            ):
                self.V, self.H, self.P = self.arnoldi.get()
            else:
                self.V, self.H = self.arnoldi.get()

    @staticmethod
    def operations(nsteps):
        return {
            "A": 1 + nsteps,
            "M": 2 + nsteps,
            "Ml": 2 + nsteps,
            "Mr": 1 + nsteps,
            "ip_B": 2 + nsteps + nsteps * (nsteps + 1) / 2,
            "axpy": 4 + 2 * nsteps + nsteps * (nsteps + 1) / 2,
        }


class _RestartedSolver:
    """Outer restart loop around an inner solver: re-launch with the last
    iterate as initial guess, catching :class:`ConvergenceError` to reuse
    the partial solver (reference: krypy/linsys.py:1021-1072)."""

    def __init__(self, Solver, linear_system, max_restarts=0, **kwargs):
        self.xk = None
        kwargs = dict(kwargs)
        self.resnorms = [np.inf]
        if linear_system.exact_solution is not None:
            self.errnorms = [np.inf]
        tol = None

        restart = 0
        while restart == 0 or (
            self.resnorms[-1] > tol and restart <= max_restarts
        ):
            try:
                if self.xk is not None:
                    kwargs["x0"] = self.xk
                sol = Solver(linear_system, **kwargs)
            except ConvergenceError as e:
                sol = e.solver

            self.xk = sol.xk
            tol = sol.tol

            # concatenate histories, dropping the duplicated point
            del self.resnorms[-1]
            self.resnorms += sol.resnorms
            if linear_system.exact_solution is not None:
                del self.errnorms[-1]
                self.errnorms += sol.errnorms
            restart += 1

        if self.resnorms[-1] > tol:
            raise ConvergenceError(
                f"No convergence after {max_restarts} restarts.", self
            )


class RestartedGmres(_RestartedSolver):
    """Restarted GMRES (reference: krypy/linsys.py:1075-1081)."""

    def __init__(self, *args, **kwargs):
        super().__init__(Gmres, *args, **kwargs)
