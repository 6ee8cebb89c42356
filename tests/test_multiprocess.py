"""Multi-process distributed runtime test (VERDICT r2 missing #3).

Launches 2 OS processes x 4 virtual CPU devices each (gloo collectives,
localhost coordinator), builds the global dp=8 mesh, runs one SPMD train
step on a globally-sharded batch, and crosses a barrier — exercising
core/dist.py end-to-end: the simulated stand-in for the reference's real
process group (torch.distributed.init_process_group, train-MaDe.py:25;
barrier :634).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_and_barrier():
    port = _free_port()
    # the pytest process exports JAX_PLATFORMS / XLA_FLAGS (conftest.py);
    # workers must configure those themselves via dist.initialize
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    losses = {}
    for pid, out in enumerate(outs):
        m = re.search(r"MP_OK pid=(\d) loss=([-\d.]+) step=(\d+)", out)
        assert m, f"no MP_OK sentinel from worker {pid}:\n{out[-4000:]}"
        assert int(m.group(1)) == pid
        assert int(m.group(3)) == 2
        losses[pid] = float(m.group(2))

    # gradients synced through the global mesh: the replicated loss must be
    # bit-identical across processes
    assert losses[0] == losses[1], losses
