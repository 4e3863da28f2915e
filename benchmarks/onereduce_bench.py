#!/usr/bin/env python
"""One-reduce solver family benchmark (round 4).

Slope-times the classic vs one-reduce (`variant="1r"` /
`ortho="cgs2_1r"`) short-recurrence solvers at 1M dof f32 on the real
chip: two fixed-iteration solves at maxiter K1 < K2, per-iteration =
(t(K2) - t(K1)) / (K2 - K1), best-of-N with varied right-hand sides
(the transport serves identical repeated requests from a cache and adds
~25 ms of constant dispatch cost -- see docs/DESIGN.md section 8).

Single-chip expectation: roughly PARITY.  The one-reduce schemes buy
their win in mesh sync points (HLO-pinned at 1 all-reduce/iteration in
tests/test_collectives.py), which a single chip does not pay; this
benchmark exists to demonstrate the rearrangements are not a single-chip
regression.  Run: python benchmarks/onereduce_bench.py [--size NX]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.real(jnp.sum(x)))


def time_solve(make, b_pool, reps=3):
    """Best-of-reps wall for a jitted solve, varied inputs, scalar-fetch
    synced."""
    make(b_pool[0])  # compile + warm
    best = float("inf")
    for i in range(reps):
        b = b_pool[(i + 1) % len(b_pool)]
        t0 = time.perf_counter()
        _sync(make(b))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1023)
    ap.add_argument("--k1", type=int, default=20)
    ap.add_argument("--k2", type=int, default=40)
    ap.add_argument("--only", default="",
                    help="comma-separated case-name substrings to run "
                         "(short-recurrence solvers tolerate a much "
                         "wider K spread than GMRES, whose per-iter "
                         "cost grows with the basis height)")
    args = ap.parse_args()

    from krypy_tpu import functional as F, ops

    nx = args.size
    N = nx * nx
    lap = ops.poisson_2d(nx)
    Mj = ops.jacobi_preconditioner(lap)
    key = jax.random.PRNGKey(0)
    b_pool = [
        jax.random.normal(k, (N,), jnp.float32)
        for k in jax.random.split(key, 4)
    ]

    def jit_solve(fn):
        j = jax.jit(fn)
        return lambda b: j(b).x

    cases = {
        "cg_classic": lambda m: jit_solve(
            lambda b: F.cg(lap, b, M=Mj, tol=0.0, maxiter=m)
        ),
        "cg_1r": lambda m: jit_solve(
            lambda b: F.cg(lap, b, M=Mj, tol=0.0, maxiter=m, variant="1r")
        ),
        "minres_classic": lambda m: jit_solve(
            lambda b: F.minres(lap, b, M=Mj, tol=0.0, maxiter=m)
        ),
        "minres_1r": lambda m: jit_solve(
            lambda b: F.minres(lap, b, M=Mj, tol=0.0, maxiter=m,
                               variant="1r")
        ),
        "gmres_cgs2": lambda m: jit_solve(
            lambda b: F.gmres(lap, b, tol=0.0, maxiter=m, ortho="cgs2")
        ),
        "gmres_1r": lambda m: jit_solve(
            lambda b: F.gmres(lap, b, tol=0.0, maxiter=m,
                              ortho="cgs2_1r")
        ),
        # round-5 lanes: fused-deflated (1 sync/iter incl. capture +
        # projection), dual-basis M, bf16 x 1r, one-reduce QMR
        "gmres_defl4_cgs2": lambda m: _defl_case(m, "cgs2"),
        "gmres_defl4_1r": lambda m: _defl_case(m, "cgs2_1r"),
        "gmres_M_cgs2": lambda m: jit_solve(
            lambda b: F.gmres(lap, b, M=Mj, tol=0.0, maxiter=m,
                              ortho="cgs2")
        ),
        "gmres_M_1r": lambda m: jit_solve(
            lambda b: F.gmres(lap, b, M=Mj, tol=0.0, maxiter=m,
                              ortho="cgs2_1r")
        ),
        "gmres_bf16_1r": lambda m: jit_solve(
            lambda b: F.gmres(lap, b, tol=0.0, maxiter=m,
                              ortho="cgs2_1r",
                              basis_dtype=jnp.bfloat16)
        ),
        "gmres_bf16_cgs2": lambda m: jit_solve(
            lambda b: F.gmres(lap, b, tol=0.0, maxiter=m, ortho="cgs2",
                              basis_dtype=jnp.bfloat16)
        ),
        "qmr_classic": lambda m: jit_solve(
            lambda b: F.qmr(lap, b, tol=0.0, maxiter=m)
        ),
        "qmr_1r": lambda m: jit_solve(
            lambda b: F.qmr(lap, b, tol=0.0, maxiter=m, variant="1r")
        ),
        "deflcg4_classic": lambda m: _deflcg_case(m, "classic"),
        "deflcg4_1r": lambda m: _deflcg_case(m, "1r"),
        # round-5: one-reduce IDR(s) -- maxiter counts MATVECS, so the
        # slope is per matvec (= per sync point in the 1r scheme)
        "idrs4_classic": lambda m: jit_solve(
            lambda b: F.idrs(lap, b, s=4, tol=0.0, maxiter=m)
        ),
        "idrs4_1r": lambda m: jit_solve(
            lambda b: F.idrs(lap, b, s=4, tol=0.0, maxiter=m,
                             variant="1r")
        ),
    }

    Ud = jax.random.normal(jax.random.PRNGKey(7), (N, 4), jnp.float32)

    def _defl_case(m, ortho):
        j = jax.jit(
            lambda b, UU: F.deflated_gmres(
                lap, b, UU, tol=0.0, maxiter=m, ortho=ortho
            )
        )
        return lambda b: j(b, Ud).x

    def _deflcg_case(m, variant):
        j = jax.jit(
            lambda b, UU: F.deflated_cg(
                lap, b, UU, tol=0.0, maxiter=m, variant=variant
            )
        )
        return lambda b: j(b, Ud).x

    if args.only:
        keys = [s.strip() for s in args.only.split(",")]
        cases = {n: f for n, f in cases.items()
                 if any(k in n for k in keys)}

    out = {"N": N, "k1": args.k1, "k2": args.k2, "per_iter_us": {}}
    for name, mk in cases.items():
        t1 = time_solve(mk(args.k1), b_pool)
        t2 = time_solve(mk(args.k2), b_pool)
        per = (t2 - t1) / (args.k2 - args.k1) * 1e6
        out["per_iter_us"][name] = round(per, 1)
        print(f"  {name}: {per:.1f} us/iter  "
              f"(t{args.k1}={t1*1e3:.1f} ms, t{args.k2}={t2*1e3:.1f} ms)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
