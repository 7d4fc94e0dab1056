"""Round-5 rowmerge-guard measurement (after topology._rowmerge_guarded).

The r5 decomposition (benchmarks/r5_guard.py, chip) attributed the guard's
clean-path tax almost entirely to the whole-tensor ``lax.cond`` sitting
between the gradient assembly and the log-softmax epilogue:

    V=32   guard off 3.192   single cond 3.333   full tiered 3.367
    V=128  guard off 3.940   single cond 4.761   full tiered 4.647

This script measures the replacement — llf_bwd now routes through
``dlogits_fast``'s composed path, where repairs merge via a fused
where+row-gather and only the rare whole-batch escalation keeps a cond —
against the guard-off floor at the shipped defaults (fold_pt=1).

Run under ``timeout 2400`` on the tunneled chip.
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

print("backend:", jax.default_backend(), flush=True)

B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))

for vocab in (32, 128):
    args = make_inputs(B, T, vocab)
    for name, kw in [
        ("guard off", dict(guard=False)),
        ("rowmerge guard (defaults)", dict()),
    ]:
        with config_override(**kw):
            ms = timed(classic_ctc_loss, args)
        print(f"V={vocab:<4d} classic [{name}]: {ms:7.3f} ms", flush=True)
    with config_override():
        ms = timed(simplified_ctc_loss, args)
    print(f"V={vocab:<4d} simplified [rowmerge defaults]: {ms:7.3f} ms",
          flush=True)
