"""Measured HBM streaming bandwidth of THIS chip (roofline anchor).

The ortho roofline discussion (docs/DESIGN.md §8) needs the *achievable*
streaming bandwidth, not the datasheet number: through the axon tunnel
the practical ceiling observed for sweep-shaped kernels was well below
the 819 GB/s v5e datasheet figure.  This probe measures classic STREAM
kernels (copy / scale / triad) with the repo's timing discipline
(CLAUDE.md): inputs vary across reps so the tunnel cache cannot serve a
stale result, completion is observed by fetching a scalar derived from
the output, best-of-N is reported.

Run on the real TPU: ``python benchmarks/stream_bench.py``.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _bench(fn, make_args, n_bytes, reps):
    best = float("inf")
    for i in range(reps):
        args = make_args(i)
        # sync the inputs so their construction is outside the timing
        for a in args:
            float(jnp.sum(a[:1]))
        t0 = time.perf_counter()
        out, s = fn(*args)
        float(s)  # completion barrier: scalar derived from the output
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return n_bytes / best / 1e9, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--log2n", type=int, nargs="*", default=[20, 22, 24])
    args = ap.parse_args()

    dev = jax.devices()[0]
    results = []
    for log2n in args.log2n:
        n = 1 << log2n
        key = jax.random.PRNGKey(0)
        x0 = jax.device_put(jax.random.normal(key, (n,), jnp.float32), dev)
        z0 = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32), dev
        )

        @jax.jit
        def copy(x):
            y = x * 1.0
            return y, y[0] + y[-1]

        @jax.jit
        def scale(x):
            y = 1.0000001 * x
            return y, y[0] + y[-1]

        @jax.jit
        def triad(x, z):
            y = 1.0000001 * x + z
            return y, y[0] + y[-1]

        fb = 4  # float32
        rows = {
            "copy": (copy, lambda i: (x0 + jnp.float32(i),), 2 * n * fb),
            "scale": (scale, lambda i: (x0 + jnp.float32(i),), 2 * n * fb),
            "triad": (
                triad,
                lambda i: (x0 + jnp.float32(i), z0 + jnp.float32(i)),
                3 * n * fb,
            ),
        }
        for name, (fn, mk, nbytes) in rows.items():
            gbs, best = _bench(fn, mk, nbytes, args.reps)
            results.append(
                {
                    "kernel": name,
                    "n": n,
                    "GBs": round(gbs, 1),
                    "best_s": round(best, 6),
                }
            )
            print(json.dumps(results[-1]), flush=True)

    peak = max(r["GBs"] for r in results)
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
