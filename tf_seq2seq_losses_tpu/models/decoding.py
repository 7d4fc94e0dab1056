"""Greedy CTC decoding (the inference counterpart of the two loss topologies).

The reference ships losses only; decoding is included here because every CTC
training loop needs at least greedy decode for validation (the end-to-end
model test uses it to confirm the label is recovered).

Both functions are jit-friendly: static shapes, mask-based, batch-major.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def greedy_decode_classic(
    logits: Array, logit_length: Array, blank_index: int = 0
):
    """Best-path decode with the classic collapse rule (`a_bb_ccc_c -> abcc`):
    merge repeats, then drop blanks.

    Returns ``(tokens [B, T], length [B])`` with tokens left-aligned and
    padded with ``blank_index``.
    """
    best = jnp.argmax(logits, axis=2)  # [B, T]
    num_t = best.shape[1]
    valid = jnp.arange(num_t)[None, :] < logit_length[:, None]
    prev = jnp.concatenate(
        [jnp.full_like(best[:, :1], -1), best[:, :-1]], axis=1
    )
    keep = valid & (best != blank_index) & (best != prev)
    return _compact(best, keep, blank_index)


def greedy_decode_simplified(
    logits: Array, logit_length: Array, blank_index: int = 0
):
    """Best-path decode with the simplified rule (`a_bb_ccc_c -> abbcccc`):
    drop blanks only, no repeat merging."""
    best = jnp.argmax(logits, axis=2)
    num_t = best.shape[1]
    valid = jnp.arange(num_t)[None, :] < logit_length[:, None]
    keep = valid & (best != blank_index)
    return _compact(best, keep, blank_index)


def _compact(tokens: Array, keep: Array, pad_value: int):
    """Left-align the kept tokens per row (stable), pad with ``pad_value``."""
    num_t = tokens.shape[1]
    # target position of each kept token = number of kept tokens before it
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, num_t)  # dump dropped tokens past the end
    out = jnp.full(tokens.shape, pad_value, dtype=tokens.dtype)
    batch_idx = jnp.arange(tokens.shape[0])[:, None]
    padded = jnp.concatenate(
        [out, jnp.zeros_like(out[:, :1])], axis=1
    )  # extra dump column
    padded = padded.at[batch_idx, jnp.minimum(pos, num_t)].set(
        jnp.where(keep, tokens, pad_value)
    )
    length = jnp.sum(keep.astype(jnp.int32), axis=1)
    return padded[:, :num_t], length
