"""Measured HBM streaming bandwidth of THIS chip (roofline anchor).

The ortho roofline discussion (docs/DESIGN.md §8) needs the *achievable*
streaming bandwidth, not the datasheet number.  A naive one-call STREAM
measurement is useless here: the axon tunnel adds ~25 ms of round-trip
overhead per dispatch (measured: best_s was ~25-28 ms at every size from
1M to 16M floats), which swamps the ~100 us the actual sweep takes.

So bandwidth is measured by SLOPE: the kernel is a data-dependent chain
of K triad sweeps inside one jit (``y <- a*x + c*y``; y's dependence on
the previous iteration forces K genuine HBM sweeps, and at 16M f32 the
64 MB working set cannot live in VMEM), timed at K1 and K2; the
per-sweep time is (t(K2)-t(K1))/(K2-K1), which cancels the constant
per-call overhead exactly.  Inputs vary across reps so the tunnel cache
cannot serve a stale result; completion is observed by fetching a scalar
derived from the output; best-of-N.

Run on the real TPU: ``python benchmarks/stream_bench.py``.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def _triad_chain(x, y, *, k):
    # jnp.roll(., 1) between iterations is the fusion barrier: a plain
    # chained AXPY is elementwise, so XLA legally fuses all k iterations
    # into ONE HBM sweep (measured: 20 TB/s "bandwidth" without the
    # roll).  The roll's two contiguous slices force y to materialize
    # every iteration while keeping the access pattern sequential, so
    # each iteration really moves 3 n-vectors through HBM.
    def body(i, y):
        return jnp.roll(1.0000001 * x + 0.999 * y, 1)

    y = jax.lax.fori_loop(0, k, body, y)
    return y[0] + y[-1] + jnp.float32(1e-30) * jnp.sum(y[::1024])


def _time_at_k(x0, y0, k, reps):
    best = float("inf")
    for i in range(reps):
        x = x0 + jnp.float32(i)
        y = y0 + jnp.float32(i)
        float(x[0] + y[0])  # inputs resident before timing
        t0 = time.perf_counter()
        float(_triad_chain(x, y, k=k))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    # sizes start at 16M floats: below ~64 MB of per-sweep traffic the
    # K-sweep delta is smaller than the tunnel's run-to-run noise
    # (measured: the 4M slope came out negative)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--log2n", type=int, nargs="*", default=[24, 25])
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=72)
    args = ap.parse_args()

    results = []
    for log2n in args.log2n:
        n = 1 << log2n
        x0 = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
        y0 = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)

        # warm both compiles
        float(_triad_chain(x0, y0, k=args.k1))
        float(_triad_chain(x0, y0, k=args.k2))

        t1 = _time_at_k(x0, y0, args.k1, args.reps)
        t2 = _time_at_k(x0, y0, args.k2, args.reps)
        per_sweep = (t2 - t1) / (args.k2 - args.k1)
        nbytes = 3 * n * 4  # read x, read y, write y
        gbs = nbytes / per_sweep / 1e9 if per_sweep > 0 else float("nan")
        results.append({
            "kernel": "triad_chain",
            "n": n,
            "GBs": round(gbs, 1),
            "per_sweep_us": round(per_sweep * 1e6, 1),
            "t_k1_s": round(t1, 5),
            "t_k2_s": round(t2, 5),
            "overhead_ms_est": round(
                (t1 - args.k1 * per_sweep) * 1e3, 2
            ),
        })
        print(json.dumps(results[-1]), flush=True)

    import math

    finite = [r["GBs"] for r in results if math.isfinite(r["GBs"])]
    peak = max(finite) if finite else float("nan")
    print(
        json.dumps(
            {
                "metric": "hbm_stream_peak",
                "value": peak,
                "unit": "GB/s",
                "devices": [str(d.device_kind) for d in jax.devices()],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
