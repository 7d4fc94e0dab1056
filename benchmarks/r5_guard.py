"""Round-5 guard decomposition + missing lever rows, at the REAL winner
config (fold_pt=1 — the r3 "fold+half" winner was a stale-trace artifact,
see pallas_lattice._cfg_jit; full corrected table in
benchmarks/results/r5_session1/r3b_levers.log).

1. The missing V=128 fold-alone row (r3b COMBOS never measured (1,0,0)
   at 128).

2. Guard clean-path decomposition at fold=1 for BOTH vocabularies —
   attributes the 0.35-0.8 ms guard-on tax (VERDICT r4 weak #3) to its
   structural pieces using config knobs only:

   - ``guard=False``                      — no guard at all (floor)
   - ``repair_bucket=0, log_fallback=0``  — single whole-batch
     ``lax.cond`` (no argsort/gather/scatter, no tiers)
   - ``repair_bucket=16, bucket2=0, log_fallback=0``
                                          — scatter form + one
     escalation cond (pure whole-batch branch)
   - defaults                             — full tiered structure
     (adds the tier-2 cond + the log-kernel branches)

Run under ``timeout 2400`` on the tunneled chip.
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

args128 = make_inputs(B, T, 128)
with config_override(fold_pt=True):
    ms = timed(classic_ctc_loss, args128)
print(f"V=128  classic fold=1 half=0 fused=0: {ms:7.3f} ms", flush=True)

VARIANTS = [
    ("guard off", dict(guard=False)),
    ("single whole-batch cond", dict(repair_bucket=0, repair_bucket2=0,
                                     log_fallback=False)),
    ("scatter form, 1 cond", dict(repair_bucket=16, repair_bucket2=0,
                                  log_fallback=False)),
    ("full tiered guard", dict()),
]
for vocab in (32, 128):
    args = make_inputs(B, T, vocab)
    for name, kw in VARIANTS:
        with config_override(fold_pt=True, **kw):
            ms = timed(classic_ctc_loss, args)
        print(
            f"V={vocab:<4d} classic fold=1 [{name}]: {ms:7.3f} ms",
            flush=True,
        )
