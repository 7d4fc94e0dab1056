"""Round-3 headline check: both topologies, V=32 and V=128, fwd+grad and
fwd-only, plus optax baselines, in ONE chip run (same-run A/B protocol)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import (  # noqa: E402
    classic_ctc_loss,
    simplified_ctc_loss,
)

print("backend:", jax.default_backend(), flush=True)

RUN_OPTAX = os.environ.get("DIAG_OPTAX", "1") != "0"
if RUN_OPTAX:
    import optax  # noqa: E402

    def optax_loss(labels, logits, label_length, logit_length, blank):
        import jax.numpy as jnp

        B, T = logits.shape[:2]
        logit_paddings = (
            jnp.arange(T)[None, :] >= logit_length[:, None]
        ).astype(jnp.float32)
        L = labels.shape[1]
        label_paddings = (
            jnp.arange(L)[None, :] >= label_length[:, None]
        ).astype(jnp.float32)
        return optax.ctc_loss(
            logits, logit_paddings, labels, label_paddings, blank_id=blank
        )

for vocab in (32, 128):
    args = make_inputs(256, 500, vocab)
    for name, fn in (
        ("classic", classic_ctc_loss),
        ("simplified", simplified_ctc_loss),
    ) + ((("optax", optax_loss),) if RUN_OPTAX else ()):
        ms_g = timed(fn, args)
        print(f"V={vocab:<4d} {name:<10s} fwd+grad: {ms_g:7.3f} ms", flush=True)
