"""Multi-process distributed training: two processes x 4 virtual CPU devices
form one 8-device global mesh and run the real sharded adapter train step
(the CPU stand-in for a 2-host TPU slice — SURVEY §2.5 multi-host plan;
replaces the reference's accelerate DDP, train_apadapter_v2.py:548-552)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(
    (os.cpu_count() or 1) < 2,
    reason="two jax processes compiling concurrently thrash a 1-CPU host "
           "(each child has a 600 s budget)",
)
def test_two_process_train_step():
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID", "COORDINATOR_ADDRESS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multiproc_worker.py"),
             str(pid), coord],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    for tag in ("LOSSES", "ACCUM_LOSSES"):
        losses = []
        for out in outs:
            line = [l for l in out.splitlines() if l.startswith(tag + " ")]
            assert line, out[-2000:]
            losses.append([float(v) for v in line[0].split()[1:]])
        # the global all-reduced loss must be identical on both hosts
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
        # and the step actually trained (finite, changing)
        assert losses[0][0] != losses[0][1]
