"""True multi-PROCESS distributed test (VERDICT r1 item 5 / SURVEY §4
'Implication'): two OS processes x 4 CPU devices each form one
jax.distributed cluster; the carrier-sharded PDSCH decode and the
window-sharded turbo decoder run over the GLOBAL 8-device mesh, so their
collectives (psum / ppermute / all_gather) cross the process boundary —
the hermetic stand-in for the multi-host DCN path."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_decodes():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools/multihost_worker.py"),
             str(pid), "2", coord, "4"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-2500:]}"
        assert "MULTIHOST_OK" in out, (out, err[-2500:])
    assert "ndev=8" in outs[0][1]
