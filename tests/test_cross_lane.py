"""Cross-lane fuzz: the functional (compile-once) and compatibility
(eager) lanes must produce the same residual histories over random
operator / preconditioner / inner-product combinations."""

import warnings

import numpy
import pytest
import jax.numpy as jnp

from krypy_tpu import functional as F, linsys

N = 12


def _spd(rng, kind):
    if kind == "diag":
        return numpy.diag(rng.uniform(0.5, 3.0, N))
    Q, _ = numpy.linalg.qr(rng.randn(N, N))
    return Q @ numpy.diag(rng.uniform(0.5, 3.0, N)) @ Q.T


def _cases():
    rng = numpy.random.RandomState(42)
    cases = []
    for seed in range(10):
        r = numpy.random.RandomState(seed)
        A = _spd(r, "dense" if seed % 2 else "diag")
        use_M = seed % 3 == 0
        use_Ml = seed % 3 == 1
        use_Mr = seed % 3 == 2
        use_ip = seed % 2 == 0
        cases.append((seed, A, use_M, use_Ml, use_Mr, use_ip))
    return cases


@pytest.mark.parametrize("solver_name", ["cg", "minres", "gmres"])
@pytest.mark.parametrize(
    "case", _cases(), ids=lambda c: f"seed{c[0]}"
)
def test_lanes_agree(solver_name, case):
    seed, A, use_M, use_Ml, use_Mr, use_ip = case
    r = numpy.random.RandomState(100 + seed)
    b = A @ r.randn(N)

    Md = r.uniform(0.5, 2.0, N) if use_M else None
    Mld = r.uniform(0.5, 2.0, N) if use_Ml else None
    Mrd = r.uniform(0.5, 2.0, N) if use_Mr else None
    ipd = r.uniform(0.5, 2.0, N) if use_ip else None

    if solver_name in ("cg", "minres"):
        # keep self-adjointness in the chosen geometry: skip combinations
        # that break it (Ml/Mr alone are not ip-self-adjoint in general)
        if use_Ml or use_Mr:
            pytest.skip("non-self-adjoint combination for CG/MINRES")
        if use_ip:
            # make A self-adjoint w.r.t. the weighted ip: A <- W^{-1} S
            A = numpy.diag(1.0 / ipd) @ A

    # functional lane
    fkw = {}
    if Md is not None:
        fkw["M"] = lambda x: x / Md
    if Mld is not None:
        fkw["Ml"] = lambda x: x / Mld
    if Mrd is not None:
        fkw["Mr"] = lambda x: x / Mrd
    if ipd is not None:
        fkw["ip"] = jnp.diag(jnp.asarray(ipd))
    fn = getattr(F, solver_name)
    res = fn(jnp.asarray(A), jnp.asarray(b), tol=1e-11, maxiter=N, **fkw)

    # compatibility lane
    ckw = {}
    if Md is not None:
        ckw["M"] = numpy.diag(1.0 / Md)
        ckw["Minv"] = numpy.diag(Md)
    if Mld is not None:
        ckw["Ml"] = numpy.diag(1.0 / Mld)
    if Mrd is not None:
        ckw["Mr"] = numpy.diag(1.0 / Mrd)
    if ipd is not None:
        ckw["ip_B"] = numpy.diag(ipd)
    sa = solver_name in ("cg", "minres")
    ls = linsys.LinearSystem(
        A, b.reshape(-1, 1),
        self_adjoint=sa, positive_definite=solver_name == "cg",
        normal=sa or None, **ckw,
    )
    cls = {
        "cg": linsys.Cg, "minres": linsys.Minres, "gmres": linsys.Gmres
    }[solver_name]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            eager = cls(ls, tol=1e-11, maxiter=N)
        except Exception as e:  # ConvergenceError keeps the solver
            eager = getattr(e, "solver", None)
            if eager is None:
                raise

    n = int(res.niter)
    func = numpy.asarray(res.resnorms[: n + 1])
    eag = numpy.asarray(eager.resnorms)
    k = min(len(func), len(eag))
    numpy.testing.assert_allclose(
        func[:k], eag[:k], rtol=1e-5, atol=1e-10,
        err_msg=f"lane mismatch for {solver_name} seed {seed}",
    )


@pytest.mark.parametrize("solver_name", ["cg", "minres", "gmres"])
def test_deflated_lanes_agree_with_M(solver_name):
    """Functional-lane deflation under the inner-product-changing
    preconditioner M (the M^{-1}-orthonormalized basis, VERDICT r1 item 7)
    must reproduce the compatibility lane's residual history."""
    from krypy_tpu import deflation as defl_compat

    r = numpy.random.RandomState(7)
    A = _spd(r, "dense")
    b = A @ r.randn(N)
    Md = r.uniform(0.5, 2.0, N)          # M = diag(1/Md), Minv = diag(Md)
    U = r.randn(N, 2)

    fn = {
        "cg": F.deflated_cg,
        "minres": F.deflated_minres,
        "gmres": F.deflated_gmres,
    }[solver_name]
    res = fn(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(U),
        M=lambda x: x / jnp.asarray(Md),
        Minv=lambda x: x * jnp.asarray(Md),
        tol=1e-11, maxiter=N,
    )

    sa = solver_name in ("cg", "minres")
    ls = linsys.LinearSystem(
        A, b.reshape(-1, 1), M=numpy.diag(1.0 / Md),
        Minv=numpy.diag(Md),
        self_adjoint=sa, positive_definite=solver_name == "cg",
        normal=sa or None,
    )
    cls = {
        "cg": defl_compat.DeflatedCg,
        "minres": defl_compat.DeflatedMinres,
        "gmres": defl_compat.DeflatedGmres,
    }[solver_name]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            eager = cls(ls, U=U, tol=1e-11, maxiter=N)
        except Exception as e:
            eager = getattr(e, "solver", None)
            if eager is None:
                raise

    n = int(res.niter)
    func = numpy.asarray(res.resnorms[: n + 1])
    eag = numpy.asarray(eager.resnorms)
    k = min(len(func), len(eag))
    numpy.testing.assert_allclose(
        func[:k], eag[:k], rtol=1e-5, atol=1e-9,
        err_msg=f"deflated M-lane mismatch for {solver_name}",
    )


def test_deflation_with_M_requires_Minv():
    r = numpy.random.RandomState(8)
    A = _spd(r, "diag")
    b = A @ r.randn(N)
    with pytest.raises(ValueError, match="Minv"):
        F.deflated_gmres(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(r.randn(N, 2)),
            M=lambda x: x, tol=1e-8,
        )
