"""Classic (Graves) CTC topology: blank collapse with repeated-token merge.

TPU-native re-implementation of ``ClassicCtcLossData``
(/root/reference/tf_seq2seq_losses/classic_ctc_loss.py:73-669).

The state lattice per sample is ``[Lp1 prefix positions] x [2 states]`` where
state 0 is "closed" and state 1 is "open" — the reference's re-encoding of the
standard 2L+1 odd/even-blank lattice (classic_ctc_loss.py:96-115):

* appending blank to any state closes it,
* appending the token equal to the last emitted one keeps an open state open
  (a repeat emission) but from a closed state *extends the prefix*,
* appending any other label token moves diagonally to an open state.

All recursions are ``jax.lax.scan`` over time with the ``[B, Lp1, 2]`` carry —
the XLA analogue of the reference's ``tf.while_loop`` ``unfold``
(tools.py:191-277) — and run time-major to avoid the reference's transposes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.ops.core import (
    CtcContext,
    expected_token_lp as core_expected_token_lp,
    select_from_act,
    take_token_logprobas,
)
from tf_seq2seq_losses_tpu.utils.numerics import (
    apply_logarithmic_mask,
    logsumexp as _lse,
    reduce_logsumexp as _reduce_lse,
)

Array = jax.Array
NEG_INF = np.float32(-np.inf)


class ClassicTerms(NamedTuple):
    """Per-step transition log-probabilities (classic_ctc_loss.py:464-563)."""

    blank_lp: Array  # [B, T] horizontal any->closed
    prev_tok_masked: Array  # [B, T, Lp1] horizontal open->open (blank excluded)
    prev_tok_plain: Array  # [B, T, Lp1] previous-label token log-prob (for combine)
    diag_closed: Array  # [B, T, Lp1] closed->open diagonal (expected token)
    diag_open: Array  # [B, T, Lp1] open->open diagonal (repetition-masked)


def terms(ctx: CtcContext) -> ClassicTerms:
    """Build the transition log-probabilities; XLA CSE de-duplicates reuse."""
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]

    # Token preceding each label position (classic_ctc_loss.py:546-558),
    # gathered as a one-hot MXU contraction (see core.take_token_logprobas).
    prev_tok_plain = take_token_logprobas(ctx.logproba, ctx.onehot_preceded)
    # Same gather but with the blank column forced to -inf
    # (classic_ctc_loss.py:528-543): a "repeat the previous token" horizontal
    # step must not fire when the preceding position is the blank pad.
    not_blank = ctx.preceded_label != ctx.blank_index
    prev_tok_masked = apply_logarithmic_mask(prev_tok_plain, not_blank[:, None, :])

    # Diagonal steps (classic_ctc_loss.py:465-501): closed->open is the
    # expected-token log-prob; open->open additionally requires the token to
    # differ from its predecessor.
    repetition_ok = ctx.label != jnp.roll(ctx.label, shift=1, axis=1)
    diag_closed = core_expected_token_lp(ctx)
    diag_open = apply_logarithmic_mask(diag_closed, repetition_ok[:, None, :])

    return ClassicTerms(
        blank_lp=ctx.blank_lp,
        prev_tok_masked=prev_tok_masked,
        prev_tok_plain=prev_tok_plain,
        diag_closed=diag_closed,
        diag_open=diag_open,
    )


def _alpha_init(ctx: CtcContext) -> Array:
    """One-hot at (l=0, closed) (classic_ctc_loss.py:453-462)."""
    batch = ctx.logproba.shape[0]
    lp1 = ctx.label.shape[1]
    init = jnp.full((batch, lp1, 2), NEG_INF, dtype=jnp.float32)
    return init.at[:, 0, 0].set(0.0)


def _alpha_step(step, carry):
    """One forward step on the [B, Lp1, 2] slice (classic_ctc_loss.py:415-451).

    ``step`` is a tuple of per-time tensors (blank [B], prev_tok_masked
    [B, Lp1], diag_closed [B, Lp1], diag_open [B, Lp1]).
    """
    blank, prev_masked, d_closed, d_open = step
    a_closed = carry[..., 0]
    a_open = carry[..., 1]
    horiz_closed = _lse(a_closed, a_open) + blank[:, None]
    horiz_open = a_open + prev_masked
    diag = _lse(a_closed + d_closed, a_open + d_open)
    # Diagonal lands one prefix position further; wrap-around is safe because
    # position Lp1-1 is always masked to -inf (l >= label_length).
    diag = jnp.roll(diag, shift=1, axis=1)
    return jnp.stack(
        [horiz_closed, _lse(horiz_open, diag)], axis=-1
    )


def alpha(ctx: CtcContext, t: "ClassicTerms" = None) -> Array:
    """Forward lattice probabilities, shape [B, T+1, Lp1, 2].

    ``alpha[b, t, l, s]``: log-prob that logits ``0..t-1`` decode the label
    prefix of length ``l`` ending in state ``s``
    (classic_ctc_loss.py:379-413).  ``t``: optionally precomputed
    :func:`terms` (callers that also need the terms avoid rebuilding the
    one-hot gathers eagerly; XLA CSE would dedup them under jit anyway).
    """
    if t is None:
        t = terms(ctx)
    xs = (
        jnp.moveaxis(t.blank_lp, 1, 0),
        jnp.moveaxis(t.prev_tok_masked, 1, 0),
        jnp.moveaxis(t.diag_closed, 1, 0),
        jnp.moveaxis(t.diag_open, 1, 0),
    )

    def body(carry, step):
        new = _alpha_step(step, carry)
        return new, new

    init = _alpha_init(ctx)
    with jax.named_scope("classic_alpha"):
        _, stacked = jax.lax.scan(body, init, xs)
    return jnp.concatenate([init[:, None], jnp.moveaxis(stacked, 0, 1)], axis=1)


def _beta_last(ctx: CtcContext) -> Array:
    """One-hot at label_length over both states (classic_ctc_loss.py:366-377)."""
    lp1 = ctx.label.shape[1]
    onehot = jnp.where(
        jnp.arange(lp1)[None, :] == ctx.label_length[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)
    return jnp.stack([onehot, onehot], axis=-1)


def _beta_step(step, carry):
    """One backward step on the [B, Lp1, 2] slice (classic_ctc_loss.py:349-364)."""
    blank, prev_masked, d_closed, d_open = step
    b_closed = carry[..., 0]
    b_open = carry[..., 1]
    horiz_closed = blank[:, None] + b_closed
    horiz_open = _lse(horiz_closed, prev_masked + b_open)
    # Diagonal: predict token l, land at open state of position l+1; the wrap
    # is masked because diag log-probs at position Lp1-1 are -inf.
    b_open_next = jnp.roll(b_open, shift=-1, axis=1)
    new_closed = _lse(horiz_closed, d_closed + b_open_next)
    new_open = _lse(horiz_open, d_open + b_open_next)
    return jnp.stack([new_closed, new_open], axis=-1)


def beta(ctx: CtcContext) -> Array:
    """Backward lattice probabilities, shape [B, T+1, Lp1, 2].

    ``beta[b, t, l, s]``: log-prob that logits ``t..T-1`` complete the label
    from prefix ``l`` in state ``s`` (classic_ctc_loss.py:310-347).
    """
    t = terms(ctx)
    xs = (
        jnp.moveaxis(t.blank_lp, 1, 0),
        jnp.moveaxis(t.prev_tok_masked, 1, 0),
        jnp.moveaxis(t.diag_closed, 1, 0),
        jnp.moveaxis(t.diag_open, 1, 0),
    )

    def body(carry, step):
        new = _beta_step(step, carry)
        return new, new

    init = _beta_last(ctx)
    with jax.named_scope("classic_beta"):
        _, stacked = jax.lax.scan(body, init, xs, reverse=True)
    return jnp.concatenate([jnp.moveaxis(stacked, 0, 1), init[:, None]], axis=1)


def loss(ctx: CtcContext, alpha_tensor: Array) -> Array:
    """``-logsumexp_s alpha[:, T]`` gathered at label_length
    (classic_ctc_loss.py:152-165)."""
    params = _reduce_lse(alpha_tensor[:, -1], axis=-1)
    picked = jnp.take_along_axis(params, ctx.label_length[:, None], axis=1)[:, 0]
    return -picked


def gamma(ctx: CtcContext) -> Array:
    """Pairwise lattice-to-lattice transition log-probs.

    ``gamma[b, t1, l1, s1, t2, l2, s2]``: log-prob of walking the lattice from
    ``(t1, l1, s1)`` to ``(t2, l2, s2)``; identity at ``t1 == t2``, ``-inf``
    for ``t1 > t2`` (classic_ctc_loss.py:167-308).  O(T^2 L^2) memory — the
    Hessian-only, small-shape path.
    """
    t = terms(ctx)
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    tp1 = num_t + 1

    eye = jnp.where(
        jnp.eye(lp1 * 2, dtype=bool), 0.0, NEG_INF
    ).astype(jnp.float32).reshape(1, 1, lp1, 2, lp1, 2)
    diagonal_gamma = jnp.broadcast_to(eye, (batch, tp1, lp1, 2, lp1, 2))

    def body(carry, inputs):
        i, blank, prev_masked, d_closed, d_open = inputs
        # Apply one alpha-style step to the trailing (l2, s2) axes of the
        # carry [B, t1, l1, s1, l2, s2] (classic_ctc_loss.py:219-284).
        g_closed = carry[..., 0]
        g_open = carry[..., 1]
        bl = blank[:, None, None, None, None]
        horiz_closed = _lse(g_closed, g_open) + bl
        horiz_open = g_open + prev_masked[:, None, None, None, :]
        diag = _lse(
            g_closed + d_closed[:, None, None, None, :],
            g_open + d_open[:, None, None, None, :],
        )
        diag = jnp.roll(diag, shift=1, axis=4)
        new = jnp.stack(
            [horiz_closed, _lse(horiz_open, diag)], axis=-1
        )
        # Rows whose start time has not been reached stay at the identity.
        started = (jnp.arange(tp1) <= i)[None, :, None, None, None, None]
        new = jnp.where(started, new, diagonal_gamma)
        return new, new

    xs = (
        jnp.arange(num_t),
        jnp.moveaxis(t.blank_lp, 1, 0),
        jnp.moveaxis(t.prev_tok_masked, 1, 0),
        jnp.moveaxis(t.diag_closed, 1, 0),
        jnp.moveaxis(t.diag_open, 1, 0),
    )
    with jax.named_scope("classic_gamma"):
        _, stacked = jax.lax.scan(body, diagonal_gamma, xs)
    full = jnp.concatenate([diagonal_gamma[None], stacked], axis=0)
    # [t2, B, t1, l1, s1, l2, s2] -> [B, t1, l1, s1, t2, l2, s2]
    full = jnp.transpose(full, [1, 2, 3, 4, 0, 5, 6])
    upper = (
        jnp.arange(tp1)[:, None] <= jnp.arange(tp1)[None, :]
    )[None, :, None, None, :, None, None]
    return apply_logarithmic_mask(full, upper)


def combine(ctx: CtcContext, a: Array, b: Array) -> Array:
    """Contract transition log-probs over the lattice into token bins.

    ``a``: [B, *DIMS_A, T, Lp1, 2];  ``b``: [B, T, Lp1, 2, *DIMS_B]
    Returns: [B, *DIMS_A, T, V, *DIMS_B]

    Reference: ``_combine_transition_probabilities``
    (classic_ctc_loss.py:565-669).  The blank column is the horizontal blank
    term; non-blank columns are the logaddexp of the repeated-token horizontal
    term (scattered by the preceded label) and the diagonal term (scattered by
    the label), both via the MXU-backed :func:`select_from_act`.
    """
    t = terms(ctx)
    batch, num_t, num_tokens = ctx.logproba.shape
    lp1 = ctx.label.shape[1]

    dims_a = a.shape[1:-3]
    dims_b = b.shape[4:]
    a_dim = int(np.prod(dims_a, dtype=np.int64)) if dims_a else 1
    d_dim = int(np.prod(dims_b, dtype=np.int64)) if dims_b else 1
    a = a.reshape(batch, a_dim, num_t, lp1, 2)  # [B, A, T, Lp1, 2]
    b = b.reshape(batch, num_t, lp1, 2, d_dim)  # [B, T, Lp1, 2, D]
    b = jnp.moveaxis(b, -1, 1)  # [B, D, T, Lp1, 2]

    a_any = _lse(a[..., 0], a[..., 1])  # [B, A, T, Lp1]
    b_closed = b[..., 0]  # [B, D, T, Lp1]
    b_open = b[..., 1]

    # Blank column: either alpha state, closed beta state, emit blank
    # (classic_ctc_loss.py:609-615).
    ab = a_any[:, :, None] + b_closed[:, None]  # [B, A, D, T, Lp1]
    blank_term = (
        ctx.blank_lp[:, None, None]
        + _reduce_lse(ab, axis=-1)
    )  # [B, A, D, T]

    # Repeated-token horizontal: open -> open emitting the preceding token
    # (classic_ctc_loss.py:617-627).
    act_h = (
        a[..., 1][:, :, None]
        + t.prev_tok_plain[:, None, None]
        + b_open[:, None]
    )  # [B, A, D, T, Lp1]
    # Diagonal: any state -> open at the next prefix position
    # (classic_ctc_loss.py:629-640).
    diag = _lse(
        a[..., 0] + t.diag_closed[:, None], a[..., 1] + t.diag_open[:, None]
    )  # [B, A, T, Lp1]
    b_open_next = jnp.roll(b_open, shift=-1, axis=-1)
    act_d = diag[:, :, None] + b_open_next[:, None]  # [B, A, D, T, Lp1]

    def scatter(act, onehot):
        # [B, A, D, T, Lp1] -> [B, A*D, T, Lp1, 1] -> [B, A*D, T, V]
        flat = act.reshape(batch, a_dim * d_dim, num_t, lp1, 1)
        out = select_from_act(flat, onehot)[..., 0]
        return out.reshape(batch, a_dim, d_dim, num_t, num_tokens)

    non_blank = _lse(
        scatter(act_h, ctx.onehot_preceded), scatter(act_d, ctx.onehot_label)
    )  # [B, A, D, T, V]

    token_is_blank = jnp.arange(num_tokens) == ctx.blank_index
    out = jnp.where(
        token_is_blank[None, None, None, None, :],
        blank_term[..., None],
        non_blank,
    )  # [B, A, D, T, V]
    out = jnp.moveaxis(out, 2, -1)  # [B, A, T, V, D]
    return out.reshape(batch, *dims_a, num_t, num_tokens, *dims_b)
