"""Multi-host (DCN) execution: the same jitted solver program on a
2-process x 4-virtual-device global CPU mesh.

This is the code-backed multi-host story (SURVEY.md section 5.8): each
subprocess calls :func:`krypy_tpu.parallel.init_distributed`, builds the
8-device GLOBAL mesh, assembles its local shards of b via
``make_global_vector``, and runs the identical jitted GMRES; the
replicated small state (resnorms) must agree bitwise across processes.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys

    coord, rank = sys.argv[1], int(sys.argv[2])

    from krypy_tpu import parallel

    parallel.init_distributed(
        coordinator_address=coord,
        num_processes=2,
        process_id=rank,
        local_device_count=4,
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from krypy_tpu import functional as F, ops

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = parallel.make_mesh()  # all 8 global devices
    nx, ny = 16, 16
    N = nx * ny
    cd = ops.convection_diffusion_2d(nx, ny)
    b = parallel.make_global_vector(
        mesh, lambda idx: np.ones(N, np.float64)[idx], (N,)
    )

    @jax.jit
    def solve(bb):
        return F.gmres(cd, bb, tol=1e-8, maxiter=60, ortho="bmgs2")

    with mesh:
        res = solve(b)

    # replicated small state is addressable on every process
    niter = int(res.niter)
    rel = float(res.resnorms[niter])
    assert int(res.status) == 0, int(res.status)

    # L3 on DCN: deflated GMRES with a 2-column global sharded basis
    U = parallel.make_global_vector(
        mesh,
        lambda idx: np.stack(
            [np.ones(N), np.linspace(0, 1, N)], axis=1
        )[idx],
        (N, 2),
    )

    @jax.jit
    def solve_deflated(bb, UU):
        return F.deflated_gmres(
            cd, bb, UU, tol=1e-8, maxiter=60, ortho="bmgs2"
        )

    with mesh:
        res_d = solve_deflated(b, U)
    niter_d = int(res_d.niter)
    rel_d = float(res_d.resnorms[niter_d])
    assert int(res_d.status) == 0, int(res_d.status)

    print(
        f"RANK{rank} niter={niter} rel={rel:.17e} "
        f"dniter={niter_d} drel={rel_d:.17e}",
        flush=True,
    )
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_global_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"localhost:{_free_port()}"

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    # the worker script lives in tmp_path, so Python puts tmp_path (not
    # the cwd) on sys.path -- the package must come via PYTHONPATH
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=repo_root,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"rank failed:\nstdout:{out}\nstderr:{err}"
        outs.append(out)

    lines = sorted(
        line for out in outs for line in out.splitlines()
        if line.startswith("RANK")
    )
    assert len(lines) == 2, lines
    # both processes observed the SAME replicated convergence history
    assert lines[0].split(" ", 1)[1] == lines[1].split(" ", 1)[1], lines
