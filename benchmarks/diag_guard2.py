"""A/B of the scatter-form saturation guard (+ bf16 one-hots) vs guard off.

Baseline (switch-form guard, f32 one-hots, same protocol):
  V=32  full 3.49 / guard-off 3.33;  V=128 full 4.85 / guard-off 4.19.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

for vocab in (32, 128):
    args = make_inputs(256, 500, vocab)
    ms_full = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} full (scatter guard): {ms_full:7.3f} ms", flush=True)
    with config_override(guard=False):
        ms_ng = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} guard off:            {ms_ng:7.3f} ms", flush=True)
