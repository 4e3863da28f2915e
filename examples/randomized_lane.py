"""The randomized lane end to end.

1. Sketched GMRES: cheap truncated-Arnoldi cycles with a shared
   Kronecker embedding (the per-iteration cost is O(k N), not O(m N)).
2. Nystrom-preconditioned CG on an SPD operator with spectral decay.
3. Randomized SVD and Hutch++ trace estimation of an implicit operator.
4. A one-shot sketched Rayleigh-Ritz spectral survey.
"""

import numpy
import jax.numpy as jnp

from krypy_tpu import functional as F, ops


def sketched_solves():
    cd = ops.convection_diffusion_2d(64, 64)
    Mj = ops.jacobi_preconditioner(cd)
    b = jnp.ones(64 * 64, jnp.float64)
    r = F.restarted_sketched_gmres(
        cd, b, M=Mj, tol=1e-8, maxiter=40, max_restarts=20, k_ortho=4
    )
    rel = float(jnp.linalg.norm(b - cd(r.x)) / jnp.linalg.norm(b))
    print(f"sketched GMRES: {int(r.niter)} iters across restarts, "
          f"true rel {rel:.2e}, converged={int(r.status) == 0}, "
          f"embedding certificate {float(r.distortion):.2f} "
          f"(near 1 = trustworthy sketch) at d={int(r.sketch_d)}")


def nystrom_cg():
    rng = numpy.random.RandomState(0)
    N = 500
    Q = numpy.linalg.qr(rng.randn(N, N))[0]
    lams = numpy.r_[numpy.logspace(4, 1, 50), numpy.ones(N - 50)]
    A = jnp.asarray(0.5 * ((Q * lams) @ Q.T + ((Q * lams) @ Q.T).T))
    b = jnp.asarray(rng.randn(N))
    plain = F.cg(A, b, tol=1e-8, maxiter=2000)
    P = F.nystrom_preconditioner(A, 60, N, seed=0, dtype=jnp.float64)
    pre = F.cg(A, b, M=P, tol=1e-8, maxiter=2000)
    print(f"nystrom CG: plain {int(plain.niter)} iters -> "
          f"preconditioned {int(pre.niter)} iters")


def lowrank_tools():
    rng = numpy.random.RandomState(1)
    m, n, k = 300, 200, 8
    A = (numpy.linalg.qr(rng.randn(m, k))[0]
         @ numpy.diag(numpy.logspace(2, 1, k))
         @ numpy.linalg.qr(rng.randn(n, k))[0].T)
    r = F.rsvd(jnp.asarray(A), k, q=2)
    sv = numpy.linalg.svd(A, compute_uv=False)[:k]
    print(f"rsvd: max sigma rel err "
          f"{float(jnp.max(jnp.abs(r.s - jnp.asarray(sv)) / jnp.asarray(sv))):.1e}")

    N = 400
    Q = numpy.linalg.qr(rng.randn(N, N))[0]
    spd = jnp.asarray((Q * numpy.r_[numpy.logspace(3, 1, 40),
                                    0.5 * numpy.ones(N - 40)]) @ Q.T)
    est, se = F.hutchpp(spd, 0, k=48, n_probes=32)
    true = float(jnp.trace(spd))
    print(f"hutch++: trace {true:.1f} estimated {float(est):.1f} "
          f"(stderr {float(se):.2f})")


def spectral_survey():
    rng = numpy.random.RandomState(2)
    n = 400
    D = numpy.diag(numpy.r_[numpy.linspace(10, 5, 6),
                            numpy.linspace(1, 0.1, n - 6)])
    Q = numpy.linalg.qr(rng.randn(n, n))[0]
    A = Q @ D @ Q.T + 0.05 * rng.randn(n, n) / numpy.sqrt(n)
    r = F.sketched_eigs(jnp.asarray(A), k=6, maxiter=80, which="lm")
    print(f"sketched_eigs: certified max pair residual "
          f"{float(r.pair_resnorms.max()):.1e}")


if __name__ == "__main__":
    sketched_solves()
    nystrom_cg()
    lowrank_tools()
    spectral_survey()
