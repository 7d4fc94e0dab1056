"""Confirm the r5b resweep signal: block_time=8 vs 16 at both
vocabularies (the bb=128 resweep rows silently re-fit to (64, 8) via
_fit_blocks, so (64,8,8) has three ~3.13-3.18 replicates vs 3.28 for the
shipped (64,16,8)).  window=16 is rejected despite its V=32 win: at V=128
it measured 5.38 ms — consistent with the tightened window-max underflow
contract flushing real random-logit inputs and the guard repairing every
step (w=8 keeps the documented contract).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

for vocab in (32, 128):
    args = make_inputs(256, 500, vocab)
    for bt in (16, 8):
        for rep in (1, 2):
            with config_override(block_time=bt):
                ms = timed(classic_ctc_loss, args)
            print(f"V={vocab:<4d} classic bt={bt:<3d} rep{rep}: {ms:7.3f} ms",
                  flush=True)

# simplified headline guard: make sure bt=8 does not regress it
args = make_inputs(256, 500, 32)
for bt in (16, 8):
    with config_override(block_time=bt):
        ms = timed(simplified_ctc_loss, args)
    print(f"V=32   simplified bt={bt:<3d}: {ms:7.3f} ms", flush=True)

# forward-only at the reference T=255 shape
args255 = make_inputs(256, 255, 32)
for bt in (16, 8):
    with config_override(block_time=bt):
        ms = timed(classic_ctc_loss, args255, forward_only=True)
    print(f"V=32   fwd-only T=255 bt={bt:<3d}: {ms:7.3f} ms", flush=True)
