"""Same-run A/B: fused d_logits epilogue vs the unfused XLA composition.

The fused kernel (pallas_lattice._fused_epilogue_call) only engages at
lane-aligned vocabularies, so the interesting row is the ASR config V=128;
V=32 rows are printed to confirm the gate leaves them untouched.  Guard
on/off rows separate the epilogue effect from the scatter-form guard cost.

Run on the tunneled chip under ``timeout 1100+`` (2+ fresh compiles).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu import simplified_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))

for vocab in (128, 32):
    args = make_inputs(B, T, vocab)
    for fn in (classic_ctc_loss, simplified_ctc_loss):
        name = fn.__name__.replace("_ctc_loss", "")
        for fused in (True, False):
            with config_override(fused_epilogue=fused):
                ms = timed(fn, args)
            print(
                f"V={vocab:<4d} {name:<10s} fused={int(fused)}: "
                f"{ms:7.3f} ms",
                flush=True,
            )
    with config_override(fused_epilogue=True, guard=False):
        ms = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} classic    fused=1 guard=0: {ms:7.3f} ms", flush=True)
