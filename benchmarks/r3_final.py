"""Round-3 final same-run table: scatter-form guard + bf16 one-hot operands.

One serialized process (tunnel protocol, see benchmarks/quick_bench.py):
classic/simplified fwd+grad at V=32 and V=128 with the guard on (default)
and off, plus same-run optax baselines and the classic forward-only row.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)


def optax_loss(labels, logits, label_length, logit_length, blank_index):
    import optax

    max_t = logits.shape[1]
    max_l = labels.shape[1]
    logit_pad = (jnp.arange(max_t)[None, :] >= logit_length[:, None]).astype(
        jnp.float32
    )
    label_pad = (jnp.arange(max_l)[None, :] >= label_length[:, None]).astype(
        jnp.float32
    )
    return optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=blank_index)


B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))

for vocab in (32, 128):
    args = make_inputs(B, T, vocab)
    ms = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} classic fwd+grad (guard on):  {ms:7.3f} ms", flush=True)
    with config_override(guard=False):
        ms = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} classic fwd+grad (guard off): {ms:7.3f} ms", flush=True)
    with config_override(stream_residuals=False):
        ms = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} classic fwd+grad (recompute): {ms:7.3f} ms", flush=True)
    ms = timed(simplified_ctc_loss, args)
    print(f"V={vocab:<4d} simplified fwd+grad:          {ms:7.3f} ms", flush=True)
    ms = timed(optax_loss, args)
    print(f"V={vocab:<4d} optax fwd+grad:               {ms:7.3f} ms", flush=True)


args = make_inputs(B, T, 32)
ms = timed(classic_ctc_loss, args, forward_only=True)
print(f"V=32   classic fwd-only T={T}:       {ms:7.3f} ms", flush=True)
