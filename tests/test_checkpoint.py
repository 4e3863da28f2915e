"""Checkpoint / resume tests (SURVEY.md §5.4: the reference's in-memory
warm state becomes a serializable pytree)."""

import numpy
import jax.numpy as jnp

from krypy_tpu import checkpoint, functional as F
from krypy_tpu import ops


def test_save_load_roundtrip(tmp_path):
    tree = {
        "x": jnp.arange(10.0),
        "nested": {"H": jnp.eye(3), "count": 4, "name": "gmres"},
        "missing": None,
    }
    checkpoint.save(str(tmp_path / "ck"), tree)
    out = checkpoint.load(str(tmp_path / "ck"))
    numpy.testing.assert_allclose(
        numpy.asarray(out["x"]), numpy.arange(10.0)
    )
    numpy.testing.assert_allclose(
        numpy.asarray(out["nested/H"]), numpy.eye(3)
    )
    assert out["nested/count"] == 4
    assert out["nested/name"] == "gmres"
    assert out["missing"] is None


def test_load_missing_returns_none(tmp_path):
    assert checkpoint.load(str(tmp_path / "nope")) is None


def test_resumable_restarted_gmres(tmp_path):
    A = numpy.diag(numpy.arange(2.0, 102.0))
    b = jnp.ones(100)
    ckdir = str(tmp_path / "solve")

    # run only 2 restart cycles, then "preempt"
    res1 = checkpoint.resumable_restarted_gmres(
        jnp.asarray(A), b, ckdir, tol=1e-10, maxiter=10, max_restarts=1
    )
    assert int(res1.status) == F.MAXITER
    state = checkpoint.load(ckdir)
    assert int(state["restart"]) == 2

    # resume in a "new process": continues from the checkpointed iterate
    res2 = checkpoint.resumable_restarted_gmres(
        jnp.asarray(A), b, ckdir, tol=1e-10, maxiter=10, max_restarts=30
    )
    assert int(res2.status) == F.CONVERGED
    x = numpy.asarray(res2.x)
    rel = numpy.linalg.norm(numpy.ones(100) - A @ x) / 10.0
    assert rel <= 1e-10
    # the residual history is the concatenation across processes
    r = numpy.asarray(res2.resnorms)
    assert r[0] == 1.0
    assert r[-1] <= 1e-10


def test_checkpointed_recycling(tmp_path):
    N = 100
    d = numpy.linspace(1, 2, N)
    d[:4] = [1e-4, 1e-3, 5e-3, 2e-2]
    A = ops.diagonal(jnp.asarray(d, dtype=jnp.float64))
    b = jnp.ones(N)
    ckdir = str(tmp_path / "rec")

    rec1 = checkpoint.CheckpointedRecycling(
        ckdir, n_vectors=3, which="sm", hermitian=True
    )
    r0 = rec1.solve(A, b, tol=1e-6, maxiter=100)

    # the basis was persisted (an extraction failure only warns -- assert
    # it did not happen so a regression there fails loudly here)
    state = checkpoint.load(ckdir)
    assert state is not None and state.get("U") is not None
    U = numpy.asarray(state["U"])
    assert U.shape == (N, 3) and numpy.all(numpy.isfinite(U))

    # "new process": the recycled basis comes from disk
    rec2 = checkpoint.CheckpointedRecycling(
        ckdir, n_vectors=3, which="sm", hermitian=True
    )
    assert rec2._rec._U is not None
    r1 = rec2.solve(A, b, tol=1e-6, maxiter=100)
    # forensics on failure: which subspace did the first solve persist?
    print("r0.niter", int(r0.niter), "r1.niter", int(r1.niter))
    print("diag(U.T A U)", numpy.diag(U.T * numpy.asarray(d) @ U))
    assert int(r1.niter) < int(r0.niter)
