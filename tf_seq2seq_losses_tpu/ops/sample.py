"""Posterior alignment sampling over the CTC lattices (beyond-reference).

Draws exact samples from the conditional alignment distribution
``P(path | label, logits)`` by forward-filtering backward-sampling (FFBS):
run the standard alpha recursion (the same one the losses use), then walk
backwards sampling each frame's predecessor with probability proportional
to ``alpha[t-1, pred] * trans(pred -> cur, frame t-1)``.  The stochastic
sibling of Viterbi forced alignment (``ops/align.py`` replaces the
categorical draw with argmax) and of the soft posteriors
(``ctc_token_posteriors`` marginalises instead of sampling).

Uses: minimum-Bayes-risk / sampled sequence-level training, alignment
uncertainty estimation, data augmentation for segmentation models.

Design notes (TPU-first, jit-compatible, static shapes):

* Transition structure mirrors ``ops/classic._alpha_step`` /
  ``ops/simplified.alpha`` exactly — a predecessor candidate set of at most
  3 (classic ``[Lp1, 2]`` closed/open lattice) or 2 (simplified ``[Lp1]``)
  weighted states per step, gathered per sample.
* Categorical draws via the Gumbel-max trick: all noise is generated
  up-front as one ``[S, T(, +1), B, K]`` tensor (no PRNG threading through
  the scan), ``-inf``-weighted candidates can never win, and the backward
  walk stays a plain ``lax.scan`` vmapped over the samples axis.  The alpha
  lattice is computed ONCE and shared by all samples.
* Frames at ``t >= logit_length`` carry the forced-blank canonicalisation
  (blank log-prob 0), so the backward walk emits exact blanks there and the
  accumulated path log-prob is unaffected; infeasible samples return
  ``-inf`` path log-prob and all-blank alignments (the loss-side
  ``+inf``-loss convention mirrored, same as Viterbi).

The reference library exposes nothing like this (losses only).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.ops import classic as _classic
from tf_seq2seq_losses_tpu.ops import simplified as _simplified
from tf_seq2seq_losses_tpu.ops.classic import terms as classic_terms
from tf_seq2seq_losses_tpu.ops.core import (
    CtcContext,
    expected_token_lp as core_expected_token_lp,
)

Array = jax.Array
NEG_INF = np.float32(-np.inf)


def _mask_samples(ctx: CtcContext, path_lp: Array, alignments: Array):
    """Blank frames past logit_length; -inf / all-blank for infeasible
    samples (alignments [B, S, T], path_lp [B, S])."""
    feasible = jnp.isfinite(path_lp)  # [B, S]
    mask = ctx.logit_length_mask[:, None, :] & feasible[:, :, None]
    alignments = jnp.where(mask, alignments, ctx.blank_index).astype(jnp.int32)
    path_lp = jnp.where(feasible, path_lp, NEG_INF)
    return alignments, path_lp


def classic_sample(
    ctx: CtcContext, key: Array, num_samples: int
) -> Tuple[Array, Array]:
    """(alignments [B, S, T], path_logprobas [B, S]) ~ P(path | label)."""
    batch, num_t, _ = ctx.logproba.shape
    t = classic_terms(ctx)
    a = _classic.alpha(ctx, t)  # [B, T+1, Lp1, 2] (terms shared, not rebuilt)
    rng = jnp.arange(batch)

    # Time-reversed per-step inputs: step i of the scan handles frame
    # t-1 = num_t-1-i, whose transition took alpha[:, t-1] to alpha[:, t].
    xs = (
        jnp.moveaxis(a[:, :-1], 1, 0)[::-1],  # alpha[:, t-1]  [T, B, Lp1, 2]
        jnp.moveaxis(t.blank_lp, 1, 0)[::-1],  # [T, B]
        jnp.moveaxis(t.prev_tok_masked, 1, 0)[::-1],  # [T, B, Lp1]
        jnp.moveaxis(t.diag_closed, 1, 0)[::-1],
        jnp.moveaxis(t.diag_open, 1, 0)[::-1],
    )

    # One Gumbel tensor for everything: [S, T+1, B, 3] (slot 0 = the
    # terminal-state draw over the 2 states, using lanes 0..1).
    gumbel = jax.random.gumbel(key, (num_samples, num_t + 1, batch, 3))

    af = a[rng, num_t, ctx.label_length]  # [B, 2] terminal values

    def one_sample_full(noise):  # noise: [T+1, B, 3]
        # Candidate predecessors + transition terms per step:
        #   closed cur: 0 -> (l, closed), 1 -> (l, open); trans = blank
        #   open cur:   0 -> (l, open) horizontal repeat,
        #               1 -> (l-1, closed) diag, 2 -> (l-1, open) diag
        s0 = jnp.argmax(af + noise[0, :, :2], axis=1).astype(jnp.int32)

        def back(carry, step):
            cur_l, cur_s, acc = carry
            a_prev, blank, prev_masked, d_closed, d_open, g = step
            lm1 = jnp.maximum(cur_l - 1, 0)
            w_closed = jnp.stack(
                [
                    a_prev[rng, cur_l, 0] + blank,
                    a_prev[rng, cur_l, 1] + blank,
                    jnp.full((batch,), NEG_INF),
                ],
                axis=1,
            )
            w_open = jnp.stack(
                [
                    a_prev[rng, cur_l, 1] + prev_masked[rng, cur_l],
                    a_prev[rng, lm1, 0] + d_closed[rng, lm1],
                    a_prev[rng, lm1, 1] + d_open[rng, lm1],
                ],
                axis=1,
            )
            open_cur = cur_s == 1
            w = jnp.where(open_cur[:, None], w_open, w_closed)
            choice = jnp.argmax(w + g, axis=1).astype(jnp.int32)
            prev_l = jnp.where(open_cur & (choice > 0), lm1, cur_l)
            prev_s = jnp.where(
                open_cur, jnp.where(choice == 0, 1, choice - 1), choice
            )
            # Per-frame emission log-prob = chosen weight minus the
            # predecessor's alpha (the transition term alone).
            trans = w[rng, choice] - a_prev[rng, prev_l, prev_s]
            emit = jnp.where(
                open_cur, ctx.label[rng, lm1], ctx.blank_index
            ).astype(jnp.int32)
            return (prev_l, prev_s, acc + trans), emit

        init = (ctx.label_length, s0, jnp.zeros((batch,), jnp.float32))
        with jax.named_scope("classic_ffbs"):
            (_, _, acc), emits_rev = jax.lax.scan(
                back, init, xs + (noise[1:],)
            )
        return jnp.moveaxis(emits_rev[::-1], 0, 1), acc  # [B, T], [B]

    alignments, path_lp = jax.vmap(one_sample_full)(gumbel)
    # feasibility from the terminal alpha (finite iff some valid path)
    feasible_lp = jnp.max(af, axis=1)  # [B]
    path_lp = jnp.where(
        jnp.isfinite(feasible_lp)[None, :], path_lp, NEG_INF
    )
    return _mask_samples(
        ctx, jnp.moveaxis(path_lp, 0, 1), jnp.moveaxis(alignments, 0, 1)
    )


def simplified_sample(
    ctx: CtcContext, key: Array, num_samples: int
) -> Tuple[Array, Array]:
    """(alignments [B, S, T], path_logprobas [B, S]) — simplified lattice
    (blank removal without collapse; the edge determines the emission)."""
    batch, num_t, _ = ctx.logproba.shape
    diag_lp = core_expected_token_lp(ctx)  # [B, T, Lp1]
    a = _simplified.alpha(ctx, diag_lp)  # [B, T+1, Lp1] (gather shared)
    rng = jnp.arange(batch)

    xs = (
        jnp.moveaxis(a[:, :-1], 1, 0)[::-1],  # [T, B, Lp1]
        jnp.moveaxis(ctx.blank_lp, 1, 0)[::-1],  # [T, B]
        jnp.moveaxis(diag_lp, 1, 0)[::-1],  # [T, B, Lp1]
    )
    gumbel = jax.random.gumbel(key, (num_samples, num_t, batch, 2))
    feasible_lp = a[rng, num_t, ctx.label_length]  # [B]

    def one_sample(noise):  # [T, B, 2]
        def back(carry, step):
            cur_l, acc = carry
            a_prev, blank, dlp, g = step
            lm1 = jnp.maximum(cur_l - 1, 0)
            # Diagonal (emit label[cur_l-1] from l-1) is impossible at
            # cur_l == 0 — the clamped gather would otherwise read lane 0
            # and offer a finite spurious self-loop (classic needs no such
            # mask: its invalid gathers all hit -inf alpha entries).
            diag_w = jnp.where(
                cur_l > 0, a_prev[rng, lm1] + dlp[rng, lm1], NEG_INF
            )
            w = jnp.stack(
                [
                    a_prev[rng, cur_l] + blank,  # horizontal: emit blank
                    diag_w,  # diagonal: emit label
                ],
                axis=1,
            )
            choice = jnp.argmax(w + g, axis=1).astype(jnp.int32)
            took_diag = choice == 1
            prev_l = jnp.where(took_diag, lm1, cur_l)
            trans = w[rng, choice] - a_prev[rng, prev_l]
            emit = jnp.where(
                took_diag, ctx.label[rng, lm1], ctx.blank_index
            ).astype(jnp.int32)
            return (prev_l, acc + trans), emit

        init = (ctx.label_length, jnp.zeros((batch,), jnp.float32))
        with jax.named_scope("simplified_ffbs"):
            (_, acc), emits_rev = jax.lax.scan(back, init, xs + (noise,))
        return jnp.moveaxis(emits_rev[::-1], 0, 1), acc

    alignments, path_lp = jax.vmap(one_sample)(gumbel)
    path_lp = jnp.where(
        jnp.isfinite(feasible_lp)[None, :], path_lp, NEG_INF
    )
    return _mask_samples(
        ctx, jnp.moveaxis(path_lp, 0, 1), jnp.moveaxis(alignments, 0, 1)
    )
