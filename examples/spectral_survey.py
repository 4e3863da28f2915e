"""The spectral-survey workflow (round-3 filtered lane), composed:

1. kpm_dos sketches WHERE the spectrum lives (density of states).
2. window_count says HOW MANY eigenvalues a window holds -- which
   sizes eigsh_window's block so it cannot saturate.
3. eigsh_window solves for the window's eigenpairs with nothing but
   matvec chains (no inner solves, no factorization).
4. eigs handles the non-Hermitian side of the same surface.

No reference analog: krypy has no eigensolver (only Ritz extraction
from existing solves, krypy/utils.py:1380-1465)."""

import numpy
import jax
import jax.numpy as jnp

from krypy_tpu import functional as F


def survey_then_solve():
    # a two-band Hermitian operator: bands [0, 1] and [3, 4]
    rng = numpy.random.default_rng(0)
    n = 500
    Q, _ = numpy.linalg.qr(rng.standard_normal((n, n)))
    ew = numpy.concatenate(
        [numpy.linspace(0.0, 1.0, 350), numpy.linspace(3.0, 4.0, 150)]
    )
    A = jnp.asarray((Q * ew) @ Q.T)

    grid, dens = F.kpm_dos(A, jax.random.PRNGKey(0), degree=160)
    gap = (grid > 1.5) & (grid < 2.5)
    print(
        f"kpm_dos: integral={numpy.trapezoid(dens, grid):.1f} "
        f"(N={n}), density in the band gap ~ "
        f"{float(numpy.abs(dens[gap]).max()):.2f}"
    )

    window = (3.0 - 1e-3, 3.2)
    cnt, se = F.window_count(
        A, window, jax.random.PRNGKey(1), n_probes=24
    )
    true = int(((ew >= window[0]) & (ew <= window[1])).sum())
    block = int(numpy.ceil(1.3 * cnt)) + 4
    print(
        f"window_count {window}: {cnt:.1f} +- {se:.1f} "
        f"(true {true}) -> block {block}"
    )

    r = F.eigsh_window(A, window, block=block, tol=1e-8)
    ni = int(r.n_inside)
    err = numpy.abs(
        numpy.sort(numpy.asarray(r.theta[:ni]))
        - numpy.sort(ew[(ew >= window[0]) & (ew <= window[1])])
    ).max()
    print(
        f"eigsh_window: {ni} pairs in {int(r.niter)} filtered "
        f"iterations (degree {r.degree}), max |theta err| = {err:.2e}, "
        f"saturated={bool(r.saturated)}"
    )


def non_hermitian_side():
    rng = numpy.random.default_rng(1)
    n = 300
    A = jnp.asarray(rng.standard_normal((n, n)) / numpy.sqrt(n))
    r = F.eigs(A, k=4, which="lr", tol=1e-9)
    th = numpy.asarray(r.theta)
    print(
        f"eigs (non-Hermitian, largest real part): "
        f"Re(theta)={th.real.round(4)}, explicit pair residuals <= "
        f"{float(numpy.asarray(r.pair_resnorms).max()):.1e}"
    )


if __name__ == "__main__":
    survey_then_solve()
    non_hermitian_side()
    print("spectral survey example done")
