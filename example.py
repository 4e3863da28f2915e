"""Convergence-history example (reference: /root/reference/example.py):
GMRES on A = diag(1e-3, 2, ..., 100), b = ones, with and without
deflation of the troublesome eigendirection.  Saves example.png."""

import numpy

import krypy_tpu


def main():
    A = numpy.diag([1.0e-3] + list(range(2, 101)))
    b = numpy.ones(100)

    _, plain = krypy_tpu.gmres(A, b)
    U = numpy.eye(100, 1)
    _, deflated = krypy_tpu.gmres(A, b, U=U)

    print("iterations: plain", len(plain.resnorms) - 1,
          "deflated", len(deflated.resnorms) - 1)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.semilogy(plain.resnorms, label="GMRES")
        plt.semilogy(deflated.resnorms, label="deflated GMRES (U = e1)")
        plt.xlabel("iteration")
        plt.ylabel("relative residual norm")
        plt.legend()
        plt.grid(True, which="both", alpha=0.3)
        plt.savefig("example.png", dpi=120, bbox_inches="tight")
        print("wrote example.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
