#!/usr/bin/env python
"""Orthogonalization roofline microbenchmark (VERDICT r2 item 2).

Measures, at m=40 / 1M dof f32 on the real TPU:

* device wall per GMRES iteration for each orthogonalization scheme,
* achieved HBM bandwidth of the orthogonalization sweeps, against the
  819 GB/s roofline of TPU v5e.

Bytes model per iteration at Krylov dimension k (f32, N-length rows):
the batched schemes sweep a row prefix of height h(k) (bucketed) or the
full m+1 buffer (legacy); each CGS pass reads the prefix twice (project
+ update), the fused Pallas kernel reads it three times TOTAL for both
passes.  Run: python benchmarks/ortho_bench.py [--size N] [--m M]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.real(jnp.sum(x)))


def _buckets(m1):
    hs, h = [], 16
    while h < m1:
        hs.append(h)
        h *= 2
    hs.append(m1)
    return hs


def _bucket_of(k, heights):
    for h in heights:
        if h >= k + 1:
            return h
    return heights[-1]


def sweep_bytes(ortho, m, N, itemsize=4):
    """Total orthogonalization HBM bytes for a full m-iteration solve."""
    heights = _buckets(m + 1)
    total = 0
    for k in range(m):
        if ortho == "cgs2":
            h, sweeps = m + 1, 4  # full masked sweeps, 2 x (proj+upd)
        elif ortho == "cgs2_fused":
            h = _bucket_of(k, heights)
            sweeps = 3  # fused kernel, prefix BlockSpec
        elif ortho == "cgs2_1r":
            # one fused (m+2, N) x (N, 2) contraction + two update
            # sweeps; full-height masked rows (the lagged buffer is not
            # bucketed), one extra row
            h, sweeps = m + 2, 3
        elif ortho == "bmgs2":
            h = min((k // 16 + 1) * 16, m + 1)
            sweeps = 4
        else:
            raise ValueError(ortho)
        total += sweeps * h * N * itemsize
    return total


def kernels_leg(N, rows, reps=4):
    """Slope-time the sharded-CGS2 kernel COMPOSITION (project_prefix ->
    apply_project -> update_prefix, 3 pallas_calls = what each shard
    runs under ``cgs2_fused_sharded``, minus the psums) against the
    2-call single-device ``cgs2_fused``.  Both move the same 3 prefix
    sweeps of HBM; the delta is the extra kernel-launch overhead the
    sharded composition pays per iteration.  Multi-chip ICI cannot be
    measured on one chip; this pins the compute side of the model."""
    from krypy_tpu.kernels.orthogonalize import (
        apply_project,
        cgs2_fused,
        project_prefix,
        update_prefix,
    )

    V = jnp.sin(
        jnp.arange(rows * N, dtype=jnp.float32).reshape(rows, N) * 1e-5
    )
    mask = jnp.ones(rows, jnp.float32)
    _sync(V)

    def fused_chain(w0, K):
        def body(w, _):
            w2, c = cgs2_fused(V, w, mask, rows=rows)
            # fusion barrier: keep XLA from collapsing reps
            return jnp.roll(w2, 1) + c[0] * 0, None

        w, _ = jax.lax.scan(body, w0, None, length=K)
        return jnp.sum(w)

    def composed_chain(w0, K):
        def body(w, _):
            c1 = project_prefix(V, w, mask, rows=rows)
            w1, c2 = apply_project(V, w, c1, mask, rows=rows)
            w2 = update_prefix(V, w1, c2, rows=rows)
            return jnp.roll(w2, 1) + (c1[0] + c2[0]) * 0, None

        w, _ = jax.lax.scan(body, w0, None, length=K)
        return jnp.sum(w)

    out = {}
    for name, chain in (("fused_2call", fused_chain),
                        ("composed_3call", composed_chain)):
        jitted = {K: jax.jit(lambda w, K=K, c=chain: c(w, K))
                  for K in (2, 2 + reps)}
        times = {}
        for K, f in jitted.items():
            w0 = jnp.cos(jnp.arange(N, dtype=jnp.float32) * 1e-4)
            float(f(w0))  # compile
            best = float("inf")
            for rep in range(3):
                w0 = jnp.cos(
                    jnp.arange(N, dtype=jnp.float32) * (1e-4 + 1e-6 * rep)
                )
                _sync(w0)
                t0 = time.perf_counter()
                float(f(w0))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per = (times[2 + reps] - times[2]) / reps
        out[name] = round(per * 1e6, 1)
        print(json.dumps({"kernel": name, "rows": rows, "N": N,
                          "us_per_rep": out[name]}), flush=True)
    print(json.dumps({
        "metric": f"sharded_cgs2_composition_rows{rows}_N{N}",
        **out,
        "extra_us_per_iter": round(
            out["composed_3call"] - out["fused_2call"], 1
        ),
    }), flush=True)


def measure_ortho(N, m, orthos, reps=5, roofline_gbs=690.0, verbose=False):
    """Slope-timed GMRES orthogonalization cost per scheme.

    Returns {scheme: {wall_s, us_per_iter, achieved_GBs, pct_roofline,
    onecall_wall_s}}.  Reused by bench.py so every driver round captures
    the BASELINE "MGS GFLOP/s (GMRES, 1M dof)" metric machine-readably
    (VERDICT r4 #6).

    Method: a trivial SPD diagonal matvec isolates the
    orthogonalization; rhs batches vary per rep and are generated ON
    DEVICE (a 4 MB host->device transfer through the tunnel costs
    ~100 ms); the axon tunnel adds ~25 ms constant per-dispatch
    overhead, so device time is measured by SLOPE -- K solves chained
    in one jit via scan, timed at K1 and K2, per-solve =
    (t(K2)-t(K1))/(K2-K1), cancelling the constant exactly.
    """
    from krypy_tpu import functional as F

    d = jnp.linspace(1.0, 2.0, N).astype(jnp.float32)
    A = lambda v: d * v
    K1, K2 = 1, 1 + reps

    def mkbs(k, seed):
        bs = jnp.sin(
            jnp.arange(k * N, dtype=jnp.float32).reshape(k, N)
            * (1e-4 + 1e-6 * seed)
        )
        _sync(bs)
        return bs

    results = {}
    for ortho in orthos:

        @jax.jit
        def multi(bs, o=ortho):
            def body(acc, b):
                r = F.gmres(A, b, tol=0.0, maxiter=m, ortho=o)
                return acc + jnp.sum(r.x), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), bs)
            return acc

        def timed(k):
            float(multi(mkbs(k, 0)))  # compile
            best = float("inf")
            for rep in range(3):
                bs = mkbs(k, rep + 1)
                t0 = time.perf_counter()
                float(multi(bs))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = timed(K1), timed(K2)
        best = (t2 - t1) / (K2 - K1)  # true device s per m-iter solve
        per_iter_us = best / m * 1e6
        # subtract nothing: matvec+rotations are ~free vs the sweeps
        gbs = sweep_bytes(ortho, m, N) / best / 1e9
        results[ortho] = {
            "wall_s": round(best, 5),
            "us_per_iter": round(per_iter_us, 1),
            "achieved_GBs": round(gbs, 1),
            "pct_roofline": round(100 * gbs / roofline_gbs, 1),
            "onecall_wall_s": round(t1, 5),
        }
        if verbose:
            print(json.dumps({"ortho": ortho, "m": m, "N": N,
                              **results[ortho]}), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024 * 1024)
    ap.add_argument("--m", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kernels", action="store_true",
                    help="run the sharded-composition kernel leg only")
    # default roofline = the MEASURED achievable streaming bandwidth of
    # this chip+runtime (benchmarks/stream_bench.py: ~690 GB/s triad at
    # 64 MB+ working sets), not the 819 GB/s datasheet figure
    ap.add_argument("--roofline-gbs", type=float, default=690.0)
    args = ap.parse_args()
    N, m = args.size, args.m

    if args.kernels:
        kernels_leg(N, args.m, reps=args.reps)
        return

    results = measure_ortho(
        N, m, ("cgs2", "cgs2_fused", "cgs2_1r", "bmgs2"),
        reps=args.reps, roofline_gbs=args.roofline_gbs, verbose=True,
    )

    best_name = min(results, key=lambda o: results[o]["wall_s"])
    print(json.dumps({
        "metric": f"gmres_ortho_m{m}_N{N}",
        "best_scheme": best_name,
        **results[best_name],
        "devices": [str(dev) for dev in jax.devices()][:1],
    }), flush=True)


if __name__ == "__main__":
    main()
