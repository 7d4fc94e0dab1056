"""Guard placement A/B on the chip: off vs grad-level (r1-r4 shape) vs
post-epilogue tiered vs branch-before-backward, at the shipped fold_pt=1
defaults.  Two repeats per cell (the tunnel's sub-ms noise).  Decides
``config.guard_mode``'s default.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))

MODES = [
    ("off", dict(guard=False)),
    ("grad", dict(guard_mode="grad")),
    ("post", dict(guard_mode="post")),
    ("pre", dict(guard_mode="pre")),
]

for vocab in (32, 128):
    args = make_inputs(B, T, vocab)
    for name, kw in MODES:
        for rep in (1, 2):
            with config_override(**kw):
                ms = timed(classic_ctc_loss, args)
            print(
                f"V={vocab:<4d} guard={name:<5s} rep{rep}: {ms:7.3f} ms",
                flush=True,
            )
