"""Geometry sweep for the streamed-residual scheme: (bt, window) x stream.

Round-2's sweep (block sizes barely matter) predates the streamed bwd; with
per-block Mosaic overhead suspected (~128 grid cells at bt=16), larger time
blocks may amortise.  Single run, classic fwd+grad B=256 T=500 V=32.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
args = make_inputs(256, 500, 32)

CONFIGS = [
    dict(stream_residuals=True, block_time=16, window=8),
    dict(stream_residuals=False, block_time=16, window=8),
    dict(stream_residuals=True, block_time=32, window=8,
         vmem_budget_mb=100, vmem_limit_mb=100),
    dict(stream_residuals=True, block_time=32, window=16,
         vmem_budget_mb=100, vmem_limit_mb=100),
    dict(stream_residuals=True, block_time=64, window=16,
         vmem_budget_mb=160, vmem_limit_mb=110),
    dict(stream_residuals=True, block_time=16, window=16),
]

for kw in CONFIGS:
    try:
        with config_override(**kw):
            ms = timed(classic_ctc_loss, args)
        print(f"{kw} -> {ms:7.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{kw} -> FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
