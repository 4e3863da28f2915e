"""The KryPy README example (reference: /root/reference/example.py) in
both lanes: A = diag(1e-3, 2, ..., 100), b = ones.

Prints the convergence history instead of plotting it."""

import numpy

import krypy_tpu
from krypy_tpu import functional as F, ops
import jax.numpy as jnp


def main():
    # --- compatibility lane: scipy-style one-liner -----------------------
    A = numpy.diag([1.0e-3] + list(range(2, 101)))
    b = numpy.ones(100)
    sol, out = krypy_tpu.gmres(A, b)
    print("compatibility lane (krypy_tpu.gmres):")
    print(f"  iterations: {len(out.resnorms) - 1}")
    print("  resnorms:", " ".join(f"{r:.1e}" for r in out.resnorms[::8]))

    # --- functional lane: one compiled dispatch --------------------------
    op = ops.readme_diag(100)
    res = F.gmres(op, jnp.ones(100), tol=1e-5)
    n = int(res.niter)
    print("functional lane (functional.gmres, one compiled while_loop):")
    print(f"  iterations: {n}, status: {int(res.status)}")
    print(
        "  resnorms:",
        " ".join(f"{float(r):.1e}" for r in res.resnorms[: n + 1: 8]),
    )


if __name__ == "__main__":
    main()
