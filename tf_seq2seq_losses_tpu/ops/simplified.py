"""Simplified CTC topology: blank removal without repeated-token collapse.

TPU-native re-implementation of ``SimplifiedCtcLossData``
(/root/reference/tf_seq2seq_losses/simplified_ctc_loss.py:70-534).

The lattice is just the ``Lp1`` prefix positions (no open/closed state axis):
a horizontal step is exactly a blank emission, a diagonal step is exactly the
next label token.  Recursions are ``jax.lax.scan`` over time with the
``[B, Lp1]`` carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.ops.core import (
    CtcContext,
    expected_token_lp as core_expected_token_lp,
    select_from_act,
)
from tf_seq2seq_losses_tpu.utils.numerics import (
    apply_logarithmic_mask,
    logsumexp as _lse,
    reduce_logsumexp as _reduce_lse,
)

Array = jax.Array
NEG_INF = np.float32(-np.inf)


def _alpha_init(ctx: CtcContext) -> Array:
    """One-hot at l=0 (simplified_ctc_loss.py:426-438)."""
    batch = ctx.logproba.shape[0]
    lp1 = ctx.label.shape[1]
    init = jnp.full((batch, lp1), NEG_INF, dtype=jnp.float32)
    return init.at[:, 0].set(0.0)


def alpha(ctx: CtcContext, diag_lp: Array = None) -> Array:
    """Forward lattice probabilities, shape [B, T+1, Lp1]
    (simplified_ctc_loss.py:358-424).  ``diag_lp``: optionally precomputed
    :func:`core.expected_token_lp` (eager callers that also need it avoid
    the duplicate one-hot gather)."""
    if diag_lp is None:
        diag_lp = core_expected_token_lp(ctx)
    xs = (
        jnp.moveaxis(ctx.blank_lp, 1, 0),
        jnp.moveaxis(diag_lp, 1, 0),
    )

    def body(carry, step):
        blank, diag_lp = step
        horizontal = carry + blank[:, None]
        # Wrap-around of the diagonal is masked: position Lp1-1 is -inf.
        diag = jnp.roll(carry + diag_lp, shift=1, axis=1)
        new = _lse(horizontal, diag)
        return new, new

    init = _alpha_init(ctx)
    with jax.named_scope("simplified_alpha"):
        _, stacked = jax.lax.scan(body, init, xs)
    return jnp.concatenate([init[:, None], jnp.moveaxis(stacked, 0, 1)], axis=1)


def _beta_last(ctx: CtcContext) -> Array:
    """One-hot at label_length (simplified_ctc_loss.py:345-356)."""
    lp1 = ctx.label.shape[1]
    return jnp.where(
        jnp.arange(lp1)[None, :] == ctx.label_length[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)


def beta(ctx: CtcContext) -> Array:
    """Backward lattice probabilities, shape [B, T+1, Lp1]
    (simplified_ctc_loss.py:291-343)."""
    xs = (
        jnp.moveaxis(ctx.blank_lp, 1, 0),
        jnp.moveaxis(core_expected_token_lp(ctx), 1, 0),
    )

    def body(carry, step):
        blank, diag_lp = step
        horizontal = carry + blank[:, None]
        diag = diag_lp + jnp.roll(carry, shift=-1, axis=1)
        new = _lse(horizontal, diag)
        return new, new

    init = _beta_last(ctx)
    with jax.named_scope("simplified_beta"):
        _, stacked = jax.lax.scan(body, init, xs, reverse=True)
    return jnp.concatenate([jnp.moveaxis(stacked, 0, 1), init[:, None]], axis=1)


def loss(ctx: CtcContext, alpha_tensor: Array) -> Array:
    """``-alpha[:, T]`` gathered at label_length (simplified_ctc_loss.py:73-83)."""
    picked = jnp.take_along_axis(
        alpha_tensor[:, -1], ctx.label_length[:, None], axis=1
    )[:, 0]
    return -picked


def gamma(ctx: CtcContext) -> Array:
    """Pairwise transition log-probs [B, T+1, Lp1, T+1, Lp1]
    (simplified_ctc_loss.py:85-191).  Identity at equal times, ``-inf`` below
    the time diagonal.  O(T^2 L^2) memory — Hessian-only path."""
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    tp1 = num_t + 1

    eye = jnp.where(jnp.eye(lp1, dtype=bool), 0.0, NEG_INF).astype(jnp.float32)
    eye = eye.reshape(1, 1, lp1, lp1)
    diagonal_gamma = jnp.broadcast_to(eye, (batch, tp1, lp1, lp1))

    def body(carry, inputs):
        i, blank, diag_lp = inputs
        horizontal = carry + blank[:, None, None, None]
        diag = carry + diag_lp[:, None, None, :]
        diag = jnp.roll(diag, shift=1, axis=3)
        new = _lse(horizontal, diag)
        started = (jnp.arange(tp1) <= i)[None, :, None, None]
        new = jnp.where(started, new, diagonal_gamma)
        return new, new

    xs = (
        jnp.arange(num_t),
        jnp.moveaxis(ctx.blank_lp, 1, 0),
        jnp.moveaxis(core_expected_token_lp(ctx), 1, 0),
    )
    with jax.named_scope("simplified_gamma"):
        _, stacked = jax.lax.scan(body, diagonal_gamma, xs)
    full = jnp.concatenate([diagonal_gamma[None], stacked], axis=0)
    # [t2, B, t1, l1, l2] -> [B, t1, l1, t2, l2]
    full = jnp.transpose(full, [1, 2, 3, 0, 4])
    upper = (
        jnp.arange(tp1)[:, None] <= jnp.arange(tp1)[None, :]
    )[None, :, None, :, None]
    return apply_logarithmic_mask(full, upper)


def combine(ctx: CtcContext, a: Array, b: Array) -> Array:
    """Contract transition log-probs over the lattice into token bins.

    ``a``: [B, *DIMS_A, T, Lp1];  ``b``: [B, T, Lp1, *DIMS_B]
    Returns: [B, *DIMS_A, T, V, *DIMS_B]

    Reference: ``_combine_transition_probabilities``
    (simplified_ctc_loss.py:456-534).  Blank column = blank emission over the
    full lattice sum; non-blank columns = diagonal term scattered by the label
    via the MXU-backed :func:`select_from_act`.
    """
    batch, num_t, num_tokens = ctx.logproba.shape
    lp1 = ctx.label.shape[1]

    dims_a = a.shape[1:-2]
    dims_b = b.shape[3:]
    a_dim = int(np.prod(dims_a, dtype=np.int64)) if dims_a else 1
    d_dim = int(np.prod(dims_b, dtype=np.int64)) if dims_b else 1
    a = a.reshape(batch, a_dim, num_t, lp1)  # [B, A, T, Lp1]
    b = b.reshape(batch, num_t, lp1, d_dim)  # [B, T, Lp1, D]
    b = jnp.moveaxis(b, -1, 1)  # [B, D, T, Lp1]

    ab = a[:, :, None] + b[:, None]  # [B, A, D, T, Lp1]
    blank_term = (
        ctx.blank_lp[:, None, None] + _reduce_lse(ab, axis=-1)
    )  # [B, A, D, T]

    b_next = jnp.roll(b, shift=-1, axis=-1)
    act_d = (
        a[:, :, None]
        + core_expected_token_lp(ctx)[:, None, None]
        + b_next[:, None]
    )  # [B, A, D, T, Lp1]

    flat = act_d.reshape(batch, a_dim * d_dim, num_t, lp1, 1)
    scattered = select_from_act(flat, ctx.onehot_label)[..., 0]
    non_blank = scattered.reshape(batch, a_dim, d_dim, num_t, num_tokens)

    token_is_blank = jnp.arange(num_tokens) == ctx.blank_index
    out = jnp.where(
        token_is_blank[None, None, None, None, :],
        blank_term[..., None],
        non_blank,
    )
    out = jnp.moveaxis(out, 2, -1)  # [B, A, T, V, D]
    return out.reshape(batch, *dims_a, num_t, num_tokens, *dims_b)
