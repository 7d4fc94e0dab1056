"""Compiled-Mosaic checks on a real TPU chip (``-m tpu``).

The suite's conftest pins the session to CPU (deterministic CI), so these
tests shell out to the standalone real-chip scripts with a clean
environment. They are skipped automatically when no TPU is reachable.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    return env


def _has_tpu():
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, env=_clean_env(), timeout=300,
    )
    return "tpu" in probe.stdout


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if not _has_tpu():
        pytest.skip("no TPU backend reachable")


def test_compiled_kernel_fuzz():
    """benchmarks/tpu_fuzz.py: kernel-vs-pure parity across geometry edge
    cases, compiled by Mosaic on the real chip."""
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "benchmarks", "tpu_fuzz.py")],
        capture_output=True, text=True, env=_clean_env(), timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ALL OK" in out.stdout, out.stdout[-2000:]


def test_compiled_smoke_shard_map():
    """benchmarks/tpu_smoke.py: shard_map + kernels + custom-VJP chain."""
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "benchmarks", "tpu_smoke.py")],
        capture_output=True, text=True, env=_clean_env(), timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout, out.stdout[-2000:]
