"""2-process jax.distributed validation of the hybrid DCN x ICI mesh.

Launches two CPU worker processes (4 virtual devices each — 8 global) that
coordinate through jax.distributed on localhost, build
`core.distributed.make_pod_mesh`, and run the sharded rSVD pipeline with a
collective-bearing compiled program.  This exercises the multi-host code
path (`core/distributed.py`) that a single-process suite cannot reach —
the JAX counterpart of the reference's `mpirun -np N` smoke runs
(SURVEY section 4, section 2.7).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pod_mesh():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": _REPO,          # strip any TPU relay hook
        "JAX_PLATFORMS": "cpu",
    })
    env.pop("XLA_FLAGS", None)        # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "worker 0: ok" in outs[0] + outs[1]
    assert "worker 1: ok" in outs[0] + outs[1]
