"""A/B: streamed-residual bwd (r3) vs residual-free block-recompute (r2).

Same-run comparison at the headline geometry (B=256, T=500) for V=32 and
V=128, both topologies.  Run on the real chip:

    timeout 1500 python benchmarks/diag_stream.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import (  # noqa: E402
    classic_ctc_loss,
    simplified_ctc_loss,
)
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

B, T = 256, 500
print("backend:", jax.default_backend())

for vocab in (32, 128):
    args = make_inputs(B, T, vocab)
    for name, fn in (("classic", classic_ctc_loss),
                     ("simplified", simplified_ctc_loss)):
        for stream in (False, True):
            with config_override(stream_residuals=stream):
                ms = timed(fn, args)
            tag = "streamed" if stream else "resid-free"
            print(f"V={vocab:<4d} {name:<10s} {tag:<10s} fwd+grad: {ms:7.3f} ms",
                  flush=True)
