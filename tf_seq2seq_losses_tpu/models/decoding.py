"""Greedy CTC decoding (the inference counterpart of the two loss topologies).

The reference ships losses only; decoding is included here because every CTC
training loop needs at least greedy decode for validation (the end-to-end
model test uses it to confirm the label is recovered).

These are convenience wrappers over :func:`ops.decode.greedy_decode` (the
engine behind the public ``ctc_greedy_decode``): they take raw logits
(arg-max is invariant under log-softmax) and pad with ``blank_index``
instead of zero — the contract the training example and model tests use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tf_seq2seq_losses_tpu.ops.decode import greedy_decode as _greedy

Array = jax.Array


def greedy_decode_classic(
    logits: Array, logit_length: Array, blank_index: int = 0
):
    """Best-path decode with the classic collapse rule (`a_bb_ccc_c -> abcc`):
    merge repeats, then drop blanks.

    Returns ``(tokens [B, T], length [B])`` with tokens left-aligned and
    padded with ``blank_index``.
    """
    return _decode(logits, logit_length, blank_index, merge_repeats=True)


def greedy_decode_simplified(
    logits: Array, logit_length: Array, blank_index: int = 0
):
    """Best-path decode with the simplified rule (`a_bb_ccc_c -> abbcccc`):
    drop blanks only, no repeat merging."""
    return _decode(logits, logit_length, blank_index, merge_repeats=False)


def _decode(logits, logit_length, blank_index, merge_repeats):
    num_t = logits.shape[1]
    tokens, length, _ = _greedy(
        logits,
        jnp.asarray(logit_length, jnp.int32),
        jnp.asarray(blank_index, jnp.int32),
        num_t,
        merge_repeats,
    )
    pad = jnp.arange(num_t, dtype=jnp.int32)[None, :] >= length[:, None]
    return jnp.where(pad, blank_index, tokens), length
