"""Viterbi forced alignment over the CTC lattices (beyond-reference).

Frame-level best-path alignments through the same state lattices the losses
use (classic ``[Lp1, 2]`` closed/open, reference
classic_ctc_loss.py:96-115; simplified ``[Lp1]``), obtained by replacing
``logsumexp`` with ``max`` in the alpha recursion and backtracking integer
argmax pointers.  The reference library exposes nothing like this; forced
alignment is the standard companion operation for CTC acoustic models
(frame labelling, segmentation, CTC-segmentation pipelines).

Pure ``lax.scan`` path only: alignment is an analysis utility, not a
training hot path — O(B·T·L) pointer memory, same envelope as the pure
loss.  Everything is jit-compatible with static shapes.

Conventions (match the loss modules exactly):

* classic: being in ``(l, open)`` after consuming frame ``t`` means frame
  ``t`` emitted (or repeated) ``label[l-1]``; ``closed`` means blank.  The
  emission therefore depends only on the *state*, not the edge.
* simplified: the *edge* determines the emission (horizontal = blank,
  diagonal into ``l`` = ``label[l-1]``), so the backtrack reads the stored
  pointer.
* frames at ``t >= logit_length`` and infeasible samples emit blank; an
  infeasible sample's ``path_logproba`` is ``-inf`` (the loss-side
  ``+inf``-loss convention mirrored).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.ops.classic import terms as classic_terms
from tf_seq2seq_losses_tpu.ops.core import (
    CtcContext,
    expected_token_lp as core_expected_token_lp,
)

Array = jax.Array
NEG_INF = np.float32(-np.inf)


def _final_state(v_last: Array, label_length: Array):
    """Gather the terminal lattice value at ``l = label_length``."""
    batch = v_last.shape[0]
    return v_last[jnp.arange(batch), label_length]


def classic_viterbi(ctx: CtcContext) -> Tuple[Array, Array]:
    """(path_logproba [B], alignment [B, T]) through the classic lattice."""
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    t = classic_terms(ctx)

    xs = (
        jnp.moveaxis(t.blank_lp, 1, 0),
        jnp.moveaxis(t.prev_tok_masked, 1, 0),
        jnp.moveaxis(t.diag_closed, 1, 0),
        jnp.moveaxis(t.diag_open, 1, 0),
    )

    init = jnp.full((batch, lp1, 2), NEG_INF, dtype=jnp.float32)
    init = init.at[:, 0, 0].set(0.0)

    def fwd(carry, step):
        blank, prev_masked, d_closed, d_open = step
        v_closed = carry[..., 0]
        v_open = carry[..., 1]
        # into (l, closed): blank from (l, closed) or (l, open)
        new_closed = jnp.maximum(v_closed, v_open) + blank[:, None]
        ptr_closed = (v_open > v_closed).astype(jnp.int32)
        # into (l, open): horizontal repeat from (l, open), or diagonal from
        # (l-1, closed/open).  Wrap of the roll is safe: position Lp1-1 is
        # -inf past label_length (same argument as ops/classic._alpha_step).
        horiz = v_open + prev_masked
        diag_c = v_closed + d_closed
        diag_o = v_open + d_open
        diag_best = jnp.roll(jnp.maximum(diag_c, diag_o), shift=1, axis=1)
        diag_from_open = jnp.roll(
            (diag_o > diag_c).astype(jnp.int32), shift=1, axis=1
        )
        new_open = jnp.maximum(horiz, diag_best)
        ptr_open = jnp.where(diag_best > horiz, 1 + diag_from_open, 0)
        new = jnp.stack([new_closed, new_open], axis=-1)
        return new, (ptr_closed, ptr_open)

    with jax.named_scope("classic_viterbi"):
        v_last, (ptr_closed, ptr_open) = jax.lax.scan(fwd, init, xs)

    vf = _final_state(v_last, ctx.label_length)  # [B, 2]
    s0 = jnp.argmax(vf, axis=1).astype(jnp.int32)
    path_lp = jnp.max(vf, axis=1)

    rng = jnp.arange(batch)

    def back(carry, ptrs):
        cur_l, cur_s = carry
        pc, po = ptrs  # [B, Lp1] each
        emit = jnp.where(
            cur_s == 1,
            ctx.label[rng, jnp.maximum(cur_l - 1, 0)],
            ctx.blank_index,
        )
        pc_here = pc[rng, cur_l]
        po_here = po[rng, cur_l]
        prev_s = jnp.where(
            cur_s == 0, pc_here, jnp.where(po_here == 0, 1, po_here - 1)
        )
        prev_l = jnp.where(
            (cur_s == 1) & (po_here > 0), cur_l - 1, cur_l
        )
        return (jnp.maximum(prev_l, 0), prev_s), emit

    with jax.named_scope("classic_viterbi_backtrack"):
        _, emits_rev = jax.lax.scan(
            back,
            (ctx.label_length, s0),
            (ptr_closed[::-1], ptr_open[::-1]),
        )
    alignment = jnp.moveaxis(emits_rev[::-1], 0, 1)  # [B, T]
    return _mask_alignment(ctx, path_lp, alignment)


def simplified_viterbi(ctx: CtcContext) -> Tuple[Array, Array]:
    """(path_logproba [B], alignment [B, T]) through the simplified
    lattice (blank removal without collapse)."""
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]

    xs = (
        jnp.moveaxis(ctx.blank_lp, 1, 0),
        jnp.moveaxis(core_expected_token_lp(ctx), 1, 0),
    )

    init = jnp.full((batch, lp1), NEG_INF, dtype=jnp.float32)
    init = init.at[:, 0].set(0.0)

    def fwd(carry, step):
        blank, diag_lp = step
        horiz = carry + blank[:, None]
        diag = jnp.roll(carry + diag_lp, shift=1, axis=1)
        new = jnp.maximum(horiz, diag)
        ptr = (diag > horiz).astype(jnp.int32)  # 1 = diagonal (emitted token)
        return new, ptr

    with jax.named_scope("simplified_viterbi"):
        v_last, ptrs = jax.lax.scan(fwd, init, xs)

    path_lp = _final_state(v_last, ctx.label_length)
    rng = jnp.arange(batch)

    def back(carry, ptr):
        cur_l = carry
        took_diag = ptr[rng, cur_l] == 1
        emit = jnp.where(
            took_diag,
            ctx.label[rng, jnp.maximum(cur_l - 1, 0)],
            ctx.blank_index,
        )
        prev_l = jnp.where(took_diag, cur_l - 1, cur_l)
        return jnp.maximum(prev_l, 0), emit

    with jax.named_scope("simplified_viterbi_backtrack"):
        _, emits_rev = jax.lax.scan(back, ctx.label_length, ptrs[::-1])
    alignment = jnp.moveaxis(emits_rev[::-1], 0, 1)
    return _mask_alignment(ctx, path_lp, alignment)


def _mask_alignment(ctx: CtcContext, path_lp: Array, alignment: Array):
    """Blank out frames past logit_length and whole infeasible samples."""
    feasible = jnp.isfinite(path_lp)
    alignment = jnp.where(
        ctx.logit_length_mask & feasible[:, None],
        alignment,
        ctx.blank_index,
    ).astype(jnp.int32)
    return path_lp, alignment
