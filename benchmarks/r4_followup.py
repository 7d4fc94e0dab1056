"""Round-4 follow-up chip measurements.

Two questions the first r4 session left open:

1. The V=128 fused-epilogue rows — r3b_levers crashed at the first
   ``fused=1`` compile (the (1, 1) scalar blockspec Mosaic rejects;
   fixed: scalars ride SMEM).  Re-measure the fused column plus the
   lever combinations around it.

2. Where the guard's clean-path cost goes (measured 0.35-0.8 ms vs
   guard off at r3 defaults).  The guard structure decomposes by
   existing config knobs alone:

   - ``guard=False``                      — no guard at all (floor)
   - ``repair_bucket=0, log_fallback=0``  — single ``lax.cond`` over the
     whole batch (no argsort/gather/scatter, no tier structure)
   - ``repair_bucket=16, bucket2=0, log_fallback=0``
                                          — scatter form + one
     escalation cond (pure whole-batch branch)
   - defaults                             — full tiered structure (adds
     the tier-2 cond + the log-kernel branches)

Run under ``timeout 1800`` on the tunneled chip.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu import simplified_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))

# --- 1. V=128 fused-epilogue rows (SMEM scalar fix) ---------------------
args128 = make_inputs(B, T, 128)
for fold, half, fused in [(0, 0, 1), (1, 1, 0), (1, 1, 1)]:
    with config_override(
        fold_pt=bool(fold), half_stream=bool(half),
        fused_epilogue=bool(fused),
    ):
        ms = timed(classic_ctc_loss, args128)
    print(
        f"V=128  classic fold={fold} half={half} fused={fused}:"
        f" {ms:7.3f} ms",
        flush=True,
    )
with config_override(fold_pt=True, half_stream=True, fused_epilogue=True):
    ms = timed(simplified_ctc_loss, args128)
print(f"V=128  simplified (all levers):  {ms:7.3f} ms", flush=True)

# --- 2. guard-overhead decomposition at V=32 (fold+half on) -------------
args32 = make_inputs(B, T, 32)
VARIANTS = [
    ("guard off", dict(guard=False)),
    ("single whole-batch cond", dict(repair_bucket=0, repair_bucket2=0,
                                     log_fallback=False)),
    ("scatter form, 1 cond", dict(repair_bucket=16, repair_bucket2=0,
                                  log_fallback=False)),
    ("full tiered guard", dict()),
]
for name, kw in VARIANTS:
    with config_override(fold_pt=True, half_stream=True, **kw):
        ms = timed(classic_ctc_loss, args32)
    print(f"V=32   classic fold=1 half=1 [{name}]: {ms:7.3f} ms", flush=True)
