"""REAL multi-process data parallelism on one box (SURVEY §2.3 DP row).

Two OS processes, ``jax.distributed.initialize`` over a local coordinator,
gloo CPU collectives, one global mesh, host-local batch assembly, sharded
mean loss + gradient — the full multi-host code path minus the physical
second host.  Loss matches a single-process reference to 1e-5 and each
process's gradient shard matches the reference rows.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parents[1])
WORKER = str(Path(__file__).resolve().parent / "_mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_loss_and_grad():
    port = str(_free_port())
    # one device per process: drop the parent suite's virtual-device
    # XLA_FLAGS (each worker would otherwise own 8 devices and the 2-row
    # local shards could not tile the 16-device global mesh)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", port, REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert any("MULTIPROCESS_DP_OK" in o for o in outs), outs[0][-2000:]
