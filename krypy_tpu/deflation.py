r"""Deflated Krylov solvers and deflation-subspace analysis.

Reference: krypy/deflation.py.  Deflation augments a Krylov solver with a
subspace U: the solver runs on the projected operator
:math:`P\,M_l A M_r` where P is the oblique projection along
:math:`M_l A M_r U`, and each iterate is corrected by re-solving the
U-component of the residual.

Device/host split: the projection and all N-dimensional work (QR of U,
operator applications, iterate correction) run on device and shard over the
mesh like the base solvers.  The small Gram-matrix machinery (E, C, B_) and
the post-hoc spectral analysis (:class:`Ritz`, :class:`Arnoldifyer`,
:func:`bound_pseudo`) operate on (n+d)-dimensional matrices (n = Krylov
dimension, d = #deflation vectors) and use the host LAPACK lane for
non-Hermitian eigenproblems, mirroring the rationale in
:mod:`krypy_tpu.spectral`.
"""

import numpy as np
import scipy.linalg
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from . import linsys, utils
from .errors import ArgumentError, AssumptionError, ConvergenceError

__all__ = [
    "DeflatedCg",
    "DeflatedMinres",
    "DeflatedGmres",
    "ObliqueProjection",
    "Ritz",
    "Arnoldifyer",
    "bound_pseudo",
]


class _Projection(utils.Projection):
    """Abstract base for deflation projections
    (reference: krypy/deflation.py:19-29)."""

    def __init__(self, linear_system, U, **kwargs):
        raise NotImplementedError(
            "abstract base class cannot be instanciated"
        )


class ObliqueProjection(_Projection):
    r"""Oblique projection for left deflation
    (reference: krypy/deflation.py:32-76).

    Orthonormalizes U in the :math:`M^{-1}`-inner product, applies the
    operator once per deflation vector, and builds the projection with range
    ``colspan(MlAMr U)`` and kernel ``colspan(U)``:math:`^\perp`.
    """

    def __init__(self, linear_system, U, qr_reorthos=0, **kwargs):
        self.linear_system = linear_system
        U = jnp.asarray(U)

        # orthonormalize U in the M^{-1}-B inner product
        U, _ = utils.qr(
            U, ip_B=linear_system.get_ip_Minv_B(), reorthos=qr_reorthos
        )
        self.U = U
        #: :math:`M_l A M_r U` -- d operator applications.
        self.AU = linear_system.MlAMr * U
        self._MAU = None

        # build the underlying Projection P_{AU, U^perp}
        utils.Projection.__init__(
            self, self.AU, self.U, ip_B=linear_system.ip_B, **kwargs
        )

    def correct(self, z):
        """Correct an approximate solution ``z`` by solving the deflation-
        space component of its residual
        (reference: krypy/deflation.py:58-68)."""
        ls = self.linear_system
        c = ls.Ml * (ls.b - ls.A * z)
        c = utils.inner(self.W, c, ip_B=self.ip_B)
        if self.Q is not None and self.R is not None:
            c = jsl.solve_triangular(self.R, jnp.dot(self.Q.conj().T, c))
        if self.WR is not self.VR:
            c = jnp.dot(self.WR, jsl.solve_triangular(self.VR, c))
        return z + jnp.dot(self.W, c)

    @property
    def MAU(self):
        """:math:`M M_l A M_r U` (cached)."""
        if self._MAU is None:
            self._MAU = self.linear_system.M * self.AU
        return self._MAU


class _DeflationMixin:
    """Mixin adding deflation to any solver class from
    :mod:`krypy_tpu.linsys` (reference: krypy/deflation.py:79-233).

    :param linear_system: the :class:`~krypy_tpu.linsys.LinearSystem`.
    :param U: basis of the deflation space, shape ``(N, d)``.
    """

    def __init__(
        self, linear_system, U=None, projection_kwargs=None, *args, **kwargs
    ):
        if U is None:
            U = jnp.zeros((linear_system.N, 0))
        U = jnp.asarray(U)
        if projection_kwargs is None:
            projection_kwargs = {}

        projection = ObliqueProjection(
            linear_system, U, **projection_kwargs
        )
        #: the oblique projection used for deflation.
        self.projection = projection

        # E = <U, MlAMr U>, recovered from the projection's factors
        if projection.Q is None and projection.R is None:
            E = jnp.eye(U.shape[1])
        else:
            E = jnp.dot(projection.Q, projection.R)
        if projection.VR is not None and projection.WR is not None:
            E = jnp.dot(projection.WR.conj().T, jnp.dot(E, projection.VR))
        #: :math:`E = \\langle U, M_l A M_r U\\rangle`.
        self.E = E

        #: :math:`C = \\langle U, M_l A M_r V_n\\rangle`, grown column by
        #: column as the iteration proceeds.
        self.C = jnp.zeros((U.shape[1], 0))
        self._B_ = None

        super().__init__(linear_system, dtype=U.dtype, *args, **kwargs)

    def _solve(self):
        N = self.linear_system.N
        P = utils.LinearOperator(
            (N, N), self.projection.AU.dtype, self._apply_projection
        )
        # the solver now iterates with the projected operator P MlAMr
        self.MlAMr = P * self.linear_system.MlAMr
        super()._solve()

    def _apply_projection(self, Av):
        """Apply the deflation projection to an operator output and record
        the Gram column :math:`\\langle U, A v\\rangle`
        (reference: krypy/deflation.py:135-143)."""
        PAv, UAv = self.projection.apply_complement(Av, return_Ya=True)
        self.C = jnp.column_stack([self.C, UAv])
        return PAv

    def _get_initial_residual(self, x0):
        """Projected initial residual :math:`M P M_l (b - A x_0)`
        (reference: krypy/deflation.py:145-159)."""
        ls = self.linear_system
        if x0 is None:
            Mlr = ls.Mlb
        else:
            Mlr = ls.Ml * (ls.b - ls.A * x0)

        PMlr, self.UMlr = self.projection.apply_complement(
            Mlr, return_Ya=True
        )
        MPMlr = ls.M * PMlr
        MPMlr_norm = utils.norm(PMlr, MPMlr, ip_B=ls.ip_B)
        return MPMlr, PMlr, MPMlr_norm

    def _get_xk(self, yk):
        xk = super()._get_xk(yk)
        return self.projection.correct(xk)

    @property
    def B_(self):
        r""":math:`\underline{B} = \langle V_{n+1}, M_l A M_r U\rangle`.

        Derived from C when the operator is self-adjoint, otherwise formed
        explicitly (reference: krypy/deflation.py:165-189)."""
        (n_, n) = self.H.shape
        ls = self.linear_system
        if self._B_ is None or self._B_.shape[0] < n_:
            if ls.self_adjoint:
                B_ = self.C.conj().T
                if n_ > n:
                    B_ = jnp.vstack(
                        [
                            B_,
                            utils.inner(
                                self.V[:, [-1]],
                                self.projection.AU,
                                ip_B=ls.ip_B,
                            ),
                        ]
                    )
                self._B_ = B_
            else:
                self._B_ = utils.inner(
                    self.V, self.projection.AU, ip_B=ls.ip_B
                )
        return self._B_

    def estimate_time(self, nsteps, ndefl, deflweight=1.0):
        """Predicted wall-clock time for ``nsteps`` deflated iterations with
        ``ndefl`` deflation vectors, combining measured per-op timings with
        the analytic operation counts (reference:
        krypy/deflation.py:191-233)."""
        solver_ops = self.operations(nsteps)
        proj_ops = {
            "A": ndefl,
            "M": ndefl,
            "Ml": ndefl,
            "Mr": ndefl,
            "ip_B": (
                ndefl * (ndefl + 1) / 2
                + ndefl**2
                + 2 * ndefl * solver_ops["Ml"]
            ),
            "axpy": (
                ndefl * (ndefl + 1) / 2
                + ndefl * ndefl
                + (2 * ndefl + 2) * solver_ops["Ml"]
            ),
        }
        if not isinstance(self.linear_system, linsys.TimedLinearSystem):
            from .errors import RuntimeError as KrypyRuntimeError

            raise KrypyRuntimeError(
                "A `TimedLinearSystem` has to be used in order to obtain "
                "timings."
            )
        timings = self.linear_system.timings
        return timings.get_ops(solver_ops) + deflweight * timings.get_ops(
            proj_ops
        )


class DeflatedCg(_DeflationMixin, linsys.Cg):
    """Deflated preconditioned CG
    (reference: krypy/deflation.py:236-263).

    Exploits the CG three-term structure to build the Gram matrix C without
    extra inner products."""

    def __init__(self, *args, **kwargs):
        self._UAps = []
        super().__init__(*args, **kwargs)

    def _apply_projection(self, Av):
        r"""Compute the column :math:`\langle U, A v_k\rangle` of C from the
        history of :math:`\langle U, A p_i\rangle` via the CG coefficient
        recurrence."""
        PAv, UAp = self.projection.apply_complement(Av, return_Ya=True)
        self._UAps.append(UAp)
        c = UAp
        rhos = self.rhos
        if self.iter > 0:
            c = c - (1 + rhos[-1] / rhos[-2]) * self._UAps[-2]
        if self.iter > 1:
            c = c + rhos[-2] / rhos[-3] * self._UAps[-3]
        c = c * (((-1) ** self.iter) / np.sqrt(rhos[-1]))
        if self.iter > 0:
            c = c - np.sqrt(rhos[-2] / rhos[-1]) * self.C[:, [-1]]
        self.C = jnp.column_stack([self.C, c])
        return PAv


class DeflatedMinres(_DeflationMixin, linsys.Minres):
    """Deflated preconditioned MINRES
    (reference: krypy/deflation.py:266-273)."""


class DeflatedGmres(_DeflationMixin, linsys.Gmres):
    """Deflated preconditioned GMRES
    (reference: krypy/deflation.py:276-283)."""


# ---------------------------------------------------------------------------
# Arnoldifyer: predict deflated-solver behavior without new matvecs
# ---------------------------------------------------------------------------
class Arnoldifyer:
    r"""Construct Arnoldi relations for *candidate* deflation subspaces from
    the data of a finished deflated solve -- without any new N-dimensional
    operator applications (reference: krypy/deflation.py:286-470).

    :param deflated_solver: a completed deflated solver instance (with
      ``store_arnoldi=True``).
    """

    def __init__(self, deflated_solver):
        self._deflated_solver = deflated_solver
        H = np.asarray(deflated_solver.H)
        B_ = np.asarray(deflated_solver.B_)
        C = np.asarray(deflated_solver.C)
        E = np.asarray(deflated_solver.E)
        V = deflated_solver.V
        U = deflated_solver.projection.U
        ls = deflated_solver.linear_system
        MAU = deflated_solver.projection.MAU

        n_, n = self.n_, self.n = H.shape
        d = self.d = U.shape[1]

        EinvC = np.linalg.solve(E, C) if d > 0 else np.zeros((0, n))

        # block matrices describing the augmented operator action on [V, U]
        self.L = np.block(
            [[H, np.zeros((n_, d))], [EinvC, np.eye(d)]]
        )
        self.J = np.block(
            [[np.eye(n, n_), B_[:n, :]], [np.zeros((d, n_)), E]]
        )
        self.M = np.block(
            [[H[:n, :n] + B_[:n, :] @ EinvC, B_[:n, :]], [C, E]]
        )
        self.A_norm = np.linalg.norm(self.M, 2)

        if d > 0:
            # rank-revealing pivoted QR of the residual of MAU w.r.t. the
            # computed bases
            resid = np.asarray(MAU - jnp.dot(U, jnp.asarray(E))
                               - jnp.dot(V, jnp.asarray(B_)))
            Q, R, perm = scipy.linalg.qr(
                resid, mode="economic", pivoting=True
            )
            perm_inv = np.argsort(perm)
            rank = int(
                (np.abs(np.diag(R)) > 1e-14 * self.A_norm).sum()
            )
            Q1 = Q[:, :rank]
            self.R12 = R[:rank, perm_inv]

            # reorthonormalize in the correct inner product
            Q1, Rt = utils.qr(jnp.asarray(Q1), ip_B=ls.get_ip_Minv_B())
            self.R12 = np.asarray(Rt) @ self.R12

            # residual helper matrix
            self.N = np.column_stack(
                [
                    np.eye(rank + n_ - n, n_ - n),
                    np.vstack([B_[n:, :], self.R12]),
                ]
            ) @ np.block(
                [[np.zeros((d + n_ - n, n)), np.eye(d + n_ - n)]]
            )
        else:
            Q1 = jnp.zeros((U.shape[0], 0))
            self.R12 = np.zeros((0, 0))
            self.N = np.block(
                [[np.zeros((n_ - n, n)), np.eye(n_ - n, n_ - n)]]
            )

        # basis of the residual space
        self.Z = jnp.column_stack([V[:, n:], jnp.asarray(Q1)])

    def get(self, Wt, full=False):
        r"""Arnoldi relation for the deflation-subspace choice
        :math:`W = [V_n, U]\tilde{W}` (``Wt.shape == (n+d, k)``,
        :math:`\tilde W^*\tilde W = I_k`).

        :return: ``Hh, Rh, q_norm, vdiff_norm, PWAW_norm`` (+ ``Vh, F`` if
          ``full=True``): the Hessenberg matrix of the predicted deflated
          operator, the perturbation core matrix, the norm of the projected
          initial vector, the initial-vector difference norm, and the norm
          of the projection :math:`P_{\mathcal{W}^\perp, A\mathcal{W}}`.
        """
        n, n_, d = self.n, self.n_, self.d
        Wt = np.asarray(Wt)
        k = Wt.shape[1]

        # orthonormal basis of Wt and its complement
        if k > 0:
            Wto, _ = scipy.linalg.qr(Wt)
            Wt = Wto[:, :k]
            Wto = Wto[:, k:]
        else:
            Wto = np.eye(Wt.shape[0])

        dsolver = self._deflated_solver

        Pt = utils.Projection(
            jnp.asarray(self.L @ Wt), jnp.asarray(self.J.conj().T @ Wt)
        ).operator_complement()
        if d > 0:
            qt = Pt * jnp.asarray(
                np.vstack(
                    [
                        [[float(dsolver.MMlr0_norm)]],
                        np.zeros((n_ - 1, 1)),
                        np.linalg.solve(
                            np.asarray(dsolver.E), np.asarray(dsolver.UMlr)
                        ),
                    ]
                )
            )
        else:
            tmp = np.zeros((n_, 1))
            tmp[0] = float(dsolver.MMlr0_norm)
            qt = Pt * jnp.asarray(tmp)
        qt = np.asarray(qt)

        q = Wto.conj().T @ (self.J @ qt)

        # rotate the nearest [V_n, U]-vector onto the first coordinate
        Q = utils.House(jnp.asarray(q))
        q_norm = float(Q.xnorm)

        # Arnoldify: Householder + Hessenberg reduction
        WtoQ = np.asarray(Q.apply(jnp.asarray(Wto.conj().T))).conj().T

        Hh, T = scipy.linalg.hessenberg(
            np.asarray(
                Q.apply(
                    jnp.asarray(
                        Wto.conj().T
                        @ (self.J @ np.asarray(Pt * jnp.asarray(self.L @ WtoQ)))
                    )
                )
            ),
            calc_q=True,
        )
        QT = np.asarray(Q.apply(jnp.asarray(T)))

        # perturbation core matrix
        Rh = self.N @ np.asarray(Pt * jnp.asarray(self.L @ (Wto @ QT)))

        # norm of difference between initial vectors
        vdiff = self.N @ qt
        vdiff_norm = 0 if vdiff.size == 0 else np.linalg.norm(vdiff, 2)

        # norm of the projection P_{W^perp, AW}
        if k > 0:
            B_ = np.asarray(dsolver.B_)
            E = np.asarray(dsolver.E)
            Y = np.block(
                [
                    [np.eye(n_), B_],
                    [np.zeros((d, n_)), E],
                    [np.zeros((self.R12.shape[0], n_)), self.R12],
                ]
            )
            YL_Q, _ = scipy.linalg.qr(Y @ (self.L @ Wt), mode="economic")
            WX = Wt.conj().T @ np.vstack(
                [YL_Q[:n, :], YL_Q[n_: n_ + d, :]]
            )
            PWAW_norm = 1.0 / np.min(scipy.linalg.svdvals(WX))
        else:
            PWAW_norm = 1.0

        if full:
            Vh = jnp.dot(
                jnp.column_stack(
                    [dsolver.V[:, :n], dsolver.projection.U]
                ),
                jnp.asarray(Wto @ QT),
            )
            ip_Minv_B = dsolver.linear_system.get_ip_Minv_B()
            Z = self.Z
            Rh_j = jnp.asarray(Rh)

            def _apply_F(x):
                """Perturbation operator
                :math:`F = -Z R_h V_h^* - V_h R_h^* Z^*`."""
                return -(
                    jnp.dot(Z, jnp.dot(Rh_j, utils.inner(Vh, x, ip_B=ip_Minv_B)))
                    + jnp.dot(
                        Vh,
                        jnp.dot(
                            Rh_j.conj().T,
                            utils.inner(Z, x, ip_B=ip_Minv_B),
                        ),
                    )
                )

            F = utils.LinearOperator(
                (Vh.shape[0], Vh.shape[0]), dtype=dsolver.dtype, dot=_apply_F
            )
            return Hh, Rh, q_norm, vdiff_norm, PWAW_norm, Vh, F
        return Hh, Rh, q_norm, vdiff_norm, PWAW_norm


def bound_pseudo(
    arnoldifyer,
    Wt,
    g_norm=0.0,
    G_norm=0.0,
    GW_norm=0.0,
    WGW_norm=0.0,
    tol=1e-6,
    pseudo_type="auto",
    pseudo_kwargs=None,
    delta_n=20,
    terminate_factor=1.0,
):
    r"""Bound the residual norms of the *next* deflated system solved with
    the candidate deflation vectors :math:`W = [V, U]\tilde W`
    (reference: krypy/deflation.py:473-734).

    ``pseudo_type`` selects how perturbations enter the bound:
    ``'auto'``/``'nonnormal'``/``'normal'``/``'hermitian'`` use
    :math:`\varepsilon`-pseudospectra of the predicted Hessenberg matrix
    (computed natively, see :mod:`krypy_tpu.pseudospectra`); ``'omit'``
    skips perturbation analysis and returns the approximate-Krylov residual
    norms only.
    """
    if pseudo_kwargs is None:
        pseudo_kwargs = {}

    Hh, Rh, q_norm, vdiff_norm, PWAW_norm = arnoldifyer.get(Wt)
    ls_orig = arnoldifyer._deflated_solver.linear_system

    k = Wt.shape[1]
    if k > 0:
        # smallest singular value of W^* A W
        WAW = np.asarray(Wt).conj().T @ (
            arnoldifyer.J @ (arnoldifyer.L @ np.asarray(Wt))
        )
        sigma_min = np.min(scipy.linalg.svdvals(WAW))
        if sigma_min <= WGW_norm:
            raise AssumptionError(
                "sigma_min(W^*AW) > ||W^*GW|| not satisfied."
            )
        eta = GW_norm / (sigma_min - WGW_norm)
    else:
        eta = 0.0
    b_norm = float(ls_orig.MMlb_norm)
    beta = PWAW_norm * (eta * (b_norm + g_norm) + g_norm) + vdiff_norm

    if g_norm >= b_norm:
        raise AssumptionError("||g_norm|| < ||b_norm|| not satisfied")

    # residual norms of the small system Hh z = e_1 q_norm
    ls_small = linsys.LinearSystem(
        jnp.asarray(Hh),
        jnp.eye(Hh.shape[0], 1) * q_norm,
        normal=ls_orig.normal,
        self_adjoint=ls_orig.self_adjoint,
        positive_definite=ls_orig.positive_definite,
    )

    Solver = type(arnoldifyer._deflated_solver)
    if issubclass(Solver, (linsys.Minres, linsys.Gmres)):
        aresnorms = utils.get_residual_norms(
            Hh, self_adjoint=ls_orig.self_adjoint
        )
    else:
        try:
            solver = Solver(ls_small, tol=tol, maxiter=Hh.shape[0])
        except ConvergenceError as e:
            solver = e.solver
        aresnorms = np.array(solver.resnorms)
    aresnorms = aresnorms * q_norm

    if pseudo_type == "omit":
        return aresnorms / (b_norm - g_norm)

    # spectrum and norm of Hh
    evals, evecs = scipy.linalg.eig(Hh)
    if ls_small.self_adjoint:
        evals = np.real(evals)
    Hh_norm = np.linalg.norm(Hh, 2)

    if pseudo_type == "auto":
        if np.linalg.norm(Hh - Hh.conj().T, 2) < 1e-14 * Hh_norm:
            pseudo_type = "hermitian"
        elif np.linalg.cond(evecs, 2) < 1 + 1e-14:
            pseudo_type = "normal"
        else:
            pseudo_type = "nonnormal"

    delta_max = 1e2 * np.max(np.abs(evals))

    # minimal delta is defined via the perturbation core Rh
    _, Rhsvd, _ = scipy.linalg.svd(Rh[:, :1]) if Rh.size else (0, [0], 0)
    delta_min = PWAW_norm * (eta * (Hh_norm + G_norm) + G_norm) + np.max(
        Rhsvd
    )
    if delta_min == 0:
        delta_min = 1e-16

    from . import pseudospectra

    if not ls_small.normal:
        pseudo = pseudospectra.NonnormalAuto(
            Hh, delta_min * 0.99, delta_max * 1.01, **pseudo_kwargs
        )
    elif not ls_small.self_adjoint:
        pseudo = pseudospectra.NormalEvals(evals)
    else:
        pseudo = None

    bounds = [aresnorms[0]]
    for i in range(1, len(aresnorms)):
        # roots of the residual polynomial of step i
        if issubclass(Solver, linsys.Cg):
            roots = scipy.linalg.eigvalsh(Hh[:i, :i])
        else:
            HhQ, HhR = scipy.linalg.qr(Hh[: i + 1, :i], mode="economic")
            roots_inv = scipy.linalg.eigvals(HhQ[:i, :].conj().T, HhR)
            roots = 1.0 / roots_inv[np.abs(roots_inv) > 1e-14]
        if ls_small.self_adjoint:
            roots = np.real(roots)

        p = utils.NormalizedRootsPolynomial(roots)
        if ls_small.self_adjoint:
            p_minmax_candidates = p.minmax_candidates()

        aresnorm = aresnorms[i]

        _, Rhsvd, _ = scipy.linalg.svd(Rh[:, :i])
        Rhnrm = np.max(Rhsvd)
        epsilon = PWAW_norm * (eta * (Hh_norm + G_norm) + G_norm) + Rhnrm
        if epsilon == 0:
            epsilon = 1e-16

        if pseudo_type == "contain":
            raise NotImplementedError("contain not yet implemented")
        if epsilon >= delta_max:
            break

        delta_log_range = np.linspace(
            np.log10(1.01 * epsilon), np.log10(delta_max), delta_n + 2
        )[0:-1]

        def compute_pseudo(delta_log):
            delta = 10**delta_log
            if ls_small.self_adjoint:
                # pseudospectrum is a union of intervals
                pseudo_intervals = utils.Intervals(
                    [
                        utils.Interval(ev - delta, ev + delta)
                        for ev in evals
                    ]
                )
                candidates = [
                    c
                    for c in p_minmax_candidates
                    if pseudo_intervals.contains(c)
                ]
                all_candidates = np.hstack(
                    [
                        pseudo_intervals.get_endpoints(),
                        np.array(candidates),
                    ]
                )
                polymax = np.max(np.abs(p(all_candidates)))
                pseudolen = 2 * delta
            else:
                pseudo_path = pseudo.contour_paths(delta)
                pseudolen = pseudo_path.length()
                if pseudolen > 0:
                    polymax = np.max(np.abs(p(pseudo_path.vertices())))
                else:
                    # level set below grid resolution: no information at
                    # this delta; report an infinite bound so the
                    # minimizer moves on
                    return np.inf

            return (
                pseudolen
                / (2 * np.pi * delta)
                * (epsilon / (delta - epsilon) * (q_norm + beta) + beta)
                * polymax
            )

        from scipy.optimize import minimize_scalar

        opt_res = minimize_scalar(
            compute_pseudo,
            bounds=(delta_log_range[0], delta_log_range[-1]),
            method="bounded",
            options={"maxiter": delta_n},
        )
        min_val = opt_res.fun
        boundval = aresnorm + min_val

        if i > 1 and boundval / bounds[-1] > terminate_factor:
            break
        bounds.append(np.min([boundval, bounds[-1]]))
    return np.array(bounds) / (b_norm - g_norm)


class Ritz:
    r"""Ritz (or harmonic Ritz) pairs of the *augmented* subspace
    :math:`[V_n, U]` from a deflated solve, via small block generalized
    eigenproblems assembled from H, B_, C, E and F
    (reference: krypy/deflation.py:737-869).

    :param deflated_solver: a completed deflated solver.
    :param mode: ``'ritz'`` or ``'harmonic'``.
    """

    def __init__(self, deflated_solver, mode="ritz"):
        self._deflated_solver = deflated_solver
        ls = deflated_solver.linear_system

        H_ = np.asarray(deflated_solver.H)
        (n_, n) = H_.shape
        H = H_[:n, :n]
        projection = deflated_solver.projection
        m = projection.U.shape[1]

        if n + m == 0:
            self.values = np.zeros((0,))
            self.coeffs = np.zeros((0,))
            self.resnorms = np.zeros((0,))
            return

        if not isinstance(projection, ObliqueProjection):
            raise ArgumentError(
                "Invalid projection used in deflated_solver. "
                "Valid are ObliqueProjection"
            )

        E = np.asarray(deflated_solver.E)
        C = np.asarray(deflated_solver.C)
        EinvC = np.linalg.solve(E, C) if m > 0 else C
        B_ = np.asarray(deflated_solver.B_)
        B = B_[:n, :]

        # Galerkin matrix of the augmented space
        M = np.block([[H + B @ EinvC, B], [C, E]])
        # Gram matrix of [V_{n+1}, MlAMr U, U]
        F = np.asarray(
            utils.inner(projection.AU, projection.MAU, ip_B=ls.ip_B)
        )
        S = np.block(
            [
                [np.eye(n_), B_, np.zeros((n_, m))],
                [B_.conj().T, F, E],
                [np.zeros((m, n_)), E.conj().T, np.eye(m)],
            ]
        )

        eig = scipy.linalg.eigh if ls.self_adjoint else scipy.linalg.eig

        if mode == "ritz":
            self.values, self.coeffs = eig(M)
        elif mode == "harmonic":
            L = np.block([[H_, np.zeros((n_, m))], [EinvC, np.eye(m)]])
            K = np.block([[np.eye(n_), B_], [B_.conj().T, F]])
            sigmas, self.coeffs = eig(M.conj().T, L.conj().T @ (K @ L))
            self.values = np.zeros(m + n, dtype=sigmas.dtype)
            zero = np.abs(sigmas) < np.finfo(float).eps
            self.values[~zero] = 1.0 / sigmas[~zero]
            self.values[zero] = np.inf
        else:
            raise ArgumentError(
                f"Invalid value '{mode}' for 'mode'. "
                "Valid are ritz and harmonic."
            )

        # normalize coefficient vectors
        self.coeffs = self.coeffs / np.linalg.norm(self.coeffs, axis=0)

        # cheap residual norms through the S Gram matrix
        self.resnorms = np.zeros(m + n)
        for i in range(n + m):
            mu = self.values[i]
            y = self.coeffs[:, [i]]
            G = np.block(
                [
                    [H_ - mu * np.eye(n_, n), np.zeros((n_, m))],
                    [EinvC, np.eye(m)],
                    [np.zeros((m, n)), -mu * np.eye(m)],
                ]
            )
            Gy = G @ y
            resnorm2 = Gy.conj().T @ (S @ Gy)
            self.resnorms[i] = np.sqrt(np.abs(resnorm2[0, 0]))

    def get_vectors(self, indices=None):
        """Ritz vectors :math:`[V_n, U]\\,\\text{coeffs}`."""
        H_ = np.asarray(self._deflated_solver.H)
        (n_, n) = H_.shape
        coeffs = (
            self.coeffs if indices is None else self.coeffs[:, list(indices)]
        )
        return jnp.dot(
            jnp.column_stack(
                [
                    self._deflated_solver.V[:, :n],
                    self._deflated_solver.projection.U,
                ]
            ),
            jnp.asarray(coeffs),
        )

    def get_explicit_residual(self, indices=None):
        """Explicit residual :math:`M_l A M_r Z - Z\\,\\text{diag}(\\mu)`."""
        ritz_vecs = self.get_vectors(indices)
        values = self.values if indices is None else self.values[list(indices)]
        return self._deflated_solver.linear_system.MlAMr * ritz_vecs - (
            ritz_vecs * jnp.asarray(values)
        )

    def get_explicit_resnorms(self, indices=None):
        """Explicit residual norms of the Ritz pairs."""
        res = self.get_explicit_residual(indices)
        ls = self._deflated_solver.linear_system
        Mres = ls.M * res
        resnorms = np.zeros(res.shape[1])
        for i in range(resnorms.shape[0]):
            resnorms[i] = float(
                utils.norm(res[:, [i]], Mres[:, [i]], ip_B=ls.ip_B)
            )
        return resnorms
