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


def _parse(outs, tag):
    for o in outs:
        for line in o.splitlines():
            if line.startswith(tag + "="):
                return float(line.split("=", 1)[1])
    raise AssertionError(f"{tag} not found in worker output: {outs}")


@pytest.mark.slow
def test_four_process_dp_tp_train_step():
    """4 OS processes, 2x2 data x model mesh, full sharded train step
    (VERDICT r3 next #7): two steps' losses must match a single-process
    run of the same program to 1e-5 — exercises >pairwise batch assembly
    (identical rows across each data group) and real TP param sharding
    over gloo collectives."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    worker4 = str(Path(__file__).resolve().parent / "_mp_worker4.py")

    def run(nproc):
        port = str(_free_port())
        procs = [
            subprocess.Popen(
                [sys.executable, worker4, str(pid), str(nproc), port, REPO],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
            for pid in range(nproc)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert any("MULTIPROCESS_DP_TP_OK" in o for o in outs)
        return _parse(outs, "MP4_LOSS0"), _parse(outs, "MP4_LOSS1")

    ref = run(1)
    got = run(4)
    assert abs(got[0] - ref[0]) < 1e-5, (got, ref)
    assert abs(got[1] - ref[1]) < 1e-5, (got, ref)


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
