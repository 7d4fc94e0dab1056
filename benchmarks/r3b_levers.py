"""Same-run decision table for the two round-3b levers.

Rows: classic fwd+grad at V in {32, 128} for every combination of
``fold_pt`` (single unmasked transition tensor + in-kernel roll) and
``fused_epilogue`` (d_logits in one kernel; only engages at V=128), plus
same-run optax baselines and the simplified topology with the winners.

Expected effects (NOTES.md): fold_pt trades ~25% of gradient-path HBM
traffic for ~2 VPU ops/step (sign uncertain — the scans are VPU-bound);
fused_epilogue removes the sums/grad [B, T, V] round-trips at V=128.

Run under ``timeout 1100+`` on the tunneled chip; ~8 fresh compiles.
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


def optax_loss(labels, logits, label_length, logit_length, blank_index):
    import optax

    max_t, max_l = logits.shape[1], labels.shape[1]
    lp = (jnp.arange(max_t)[None, :] >= logit_length[:, None]).astype(
        jnp.float32
    )
    lb = (jnp.arange(max_l)[None, :] >= label_length[:, None]).astype(
        jnp.float32
    )
    return optax.ctc_loss(logits, lp, labels, lb, blank_id=blank_index)


B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))

# (fold_pt, half_stream, fused_epilogue) combos; fused only matters at
# V % 128 == 0, so V=32 sweeps (fold, half) and V=128 runs the fused column
COMBOS = {
    32: [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)],
    128: [(0, 0, 0), (1, 1, 0), (0, 0, 1), (1, 0, 1), (1, 1, 1)],
}

for vocab in (32, 128):
    args = make_inputs(B, T, vocab)
    for fold, half, fused in COMBOS[vocab]:
        with config_override(
            fold_pt=bool(fold), half_stream=bool(half),
            fused_epilogue=bool(fused),
        ):
            ms = timed(classic_ctc_loss, args)
        print(
            f"V={vocab:<4d} classic fold={fold} half={half} fused={fused}:"
            f" {ms:7.3f} ms",
            flush=True,
        )
    with config_override(fold_pt=True, half_stream=True, fused_epilogue=True):
        ms = timed(simplified_ctc_loss, args)
    print(f"V={vocab:<4d} simplified (all levers):  {ms:7.3f} ms", flush=True)
    ms = timed(optax_loss, args)
    print(f"V={vocab:<4d} optax:                    {ms:7.3f} ms", flush=True)
