"""CTC prefix beam search decoding — jit-compatible, static shapes.

The last companion operation a CTC user needs (loss / gradients /
posteriors / forced alignment / **decode**); the reference library exposes
none of the decode side.  Standard prefix beam search (Hannun et al. 2014)
re-designed for XLA:

* **Static beams.**  The beam state is fixed-shape: ``tokens [K, Lcap]``,
  ``length/last [K]``, per-prefix probability components ``(pb, pnb)``
  (paths ending in blank / non-blank), and a pair of independent rolling
  32-bit prefix hashes.
* **Exact prefix merging without dynamic dicts.**  Each frame produces the
  ``K`` "stay" candidates plus ``K x V`` single-token extensions; duplicate
  prefixes (different parents reaching the same prefix) are merged exactly
  by lexsorting the candidates on the hash pair, segment-logsumexp over
  runs of equal hashes, and keeping one representative per run.  A merge
  error would need a simultaneous collision of both independent hashes
  inside one frame's candidate set (~``(KV)^2 / 2^64``, ~1e-13 at K=16,
  V=128) — negligible, and documented here.
* **Pruning** is ``jax.lax.top_k`` on the merged total ``pb (+) pnb``.

With ``beam_width`` at least the number of reachable prefixes the search
prunes nothing, so every returned score equals the sequence's *exact* total
CTC probability — the property the enumeration-oracle tests pin.

Topologies mirror the losses: ``classic`` is standard CTC decoding
(repeat-collapse: extending with the last token needs an intervening
blank); ``simplified`` is plain blank removal (every non-blank emission
appends).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.utils.numerics import (
    logsumexp as _lse,
    unsorted_segment_logsumexp,
)

Array = jax.Array
NEG_INF = np.float32(-np.inf)
# independent multiplicative rolling-hash constants (odd -> invertible
# mod 2^32, so single-token extensions never collide trivially)
_H1_MULT = np.uint32(0x85EBCA6B)
_H2_MULT = np.uint32(0xC2B2AE35)


def _beam_search_single(
    lp: Array,  # [T, V] log-probs for one sample
    logit_length: Array,  # [] int32
    blank: Array,  # [] int32
    beam_width: int,
    l_cap: int,
    merge_repeats: bool,
) -> Tuple[Array, Array, Array]:
    num_t, vocab = lp.shape
    k = beam_width
    n_cand = k * (1 + vocab)

    tokens0 = jnp.zeros((k, l_cap), jnp.int32)
    length0 = jnp.zeros((k,), jnp.int32)
    last0 = jnp.full((k,), -1, jnp.int32)
    h10 = jnp.zeros((k,), jnp.uint32)
    h20 = jnp.zeros((k,), jnp.uint32)
    # beam 0 = the empty prefix with probability 1; the rest are dead slots
    pb0 = jnp.full((k,), NEG_INF, jnp.float32).at[0].set(0.0)
    pnb0 = jnp.full((k,), NEG_INF, jnp.float32)
    # dead slots get distinct sentinel hashes so they can never merge with
    # (and soak up the representative slot of) a live prefix; the two
    # sentinels are derived from DIFFERENT constants so the (h1, h2) pair
    # stays independent — equal sentinels would let a live prefix whose two
    # hashes happen to coincide merge with a dead slot (ADVICE r3)
    iota = jnp.arange(k, dtype=jnp.uint32)
    h10 = h10.at[:].set(iota | jnp.uint32(1 << 31))
    h20 = h20.at[:].set((iota * _H2_MULT) | jnp.uint32(1 << 31))
    h10 = h10.at[0].set(0)
    h20 = h20.at[0].set(0)

    tok_ids = jnp.arange(vocab, dtype=jnp.int32)

    def frame(state, inputs):
        tokens, length, last, h1, h2, pb, pnb = state
        lp_t, t = inputs
        # frames past logit_length behave as forced blank: stay with +0
        live = t < logit_length
        blank_lp = jnp.where(live, lp_t[blank], 0.0)
        tok_lp = jnp.where(live, lp_t, NEG_INF)  # [V]

        tot = _lse(pb, pnb)  # [K]

        # --- stay candidates (prefix unchanged) ---
        stay_pb = tot + blank_lp
        if merge_repeats:
            # classic: a repeated last token continues the same prefix
            last_lp = jnp.where(
                last >= 0, tok_lp[jnp.maximum(last, 0)], NEG_INF
            )
            stay_pnb = pnb + last_lp
        else:
            stay_pnb = jnp.full((k,), NEG_INF, jnp.float32)

        # --- extension candidates [K, V] ---
        if merge_repeats:
            # extending with the last token requires paths ending in blank
            base = jnp.where(tok_ids[None, :] == last[:, None],
                             pb[:, None], tot[:, None])
        else:
            base = tot[:, None]
        ext_pnb = base + tok_lp[None, :]
        dead = (
            (tok_ids[None, :] == blank)
            | (length[:, None] >= l_cap)
            | ~live
        )
        ext_pnb = jnp.where(dead, NEG_INF, ext_pnb)
        ext_pb = jnp.full((k, vocab), NEG_INF, jnp.float32)

        pos = jnp.arange(l_cap, dtype=jnp.int32)
        write = pos[None, :] == jnp.minimum(length, l_cap - 1)[:, None]
        ext_tokens = jnp.where(
            write[:, None, :], tok_ids[None, :, None], tokens[:, None, :]
        )  # [K, V, Lcap]
        ext_length = jnp.minimum(length[:, None] + 1, l_cap) + jnp.zeros(
            (1, vocab), jnp.int32
        )
        ext_last = jnp.broadcast_to(tok_ids[None, :], (k, vocab))
        ext_h1 = h1[:, None] * _H1_MULT + (tok_ids[None, :] + 1).astype(
            jnp.uint32
        )
        ext_h2 = h2[:, None] * _H2_MULT + (tok_ids[None, :] + 1).astype(
            jnp.uint32
        )

        # --- pool ---
        c_tokens = jnp.concatenate(
            [tokens[:, None, :], ext_tokens], axis=1
        ).reshape(n_cand, l_cap)
        c_length = jnp.concatenate(
            [length[:, None], ext_length], axis=1
        ).reshape(n_cand)
        c_last = jnp.concatenate(
            [last[:, None], ext_last], axis=1
        ).reshape(n_cand)
        c_h1 = jnp.concatenate([h1[:, None], ext_h1], axis=1).reshape(n_cand)
        c_h2 = jnp.concatenate([h2[:, None], ext_h2], axis=1).reshape(n_cand)
        c_pb = jnp.concatenate([stay_pb[:, None], ext_pb], axis=1).reshape(
            n_cand
        )
        c_pnb = jnp.concatenate([stay_pnb[:, None], ext_pnb], axis=1).reshape(
            n_cand
        )

        # --- exact merge of duplicate prefixes: lexsort on the hash pair,
        # segment-combine runs, keep one representative per run ---
        order = jnp.lexsort((c_h2, c_h1))
        s_h1, s_h2 = c_h1[order], c_h2[order]
        new_run = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (s_h1[1:] != s_h1[:-1]) | (s_h2[1:] != s_h2[:-1]),
            ]
        )
        seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1
        m_pb = unsorted_segment_logsumexp(c_pb[order], seg, n_cand)
        m_pnb = unsorted_segment_logsumexp(c_pnb[order], seg, n_cand)
        rep_pb = jnp.where(new_run, m_pb[seg], NEG_INF)
        rep_pnb = jnp.where(new_run, m_pnb[seg], NEG_INF)

        # --- prune to top K by total probability ---
        score = _lse(rep_pb, rep_pnb)
        _, top = jax.lax.top_k(score, k)
        sel = order[top]
        return (
            c_tokens[sel],
            c_length[sel],
            c_last[sel],
            c_h1[sel],
            c_h2[sel],
            rep_pb[top],
            rep_pnb[top],
        ), None

    state = (tokens0, length0, last0, h10, h20, pb0, pnb0)
    xs = (lp, jnp.arange(num_t, dtype=jnp.int32))
    with jax.named_scope("ctc_beam_search"):
        (tokens, length, _, _, _, pb, pnb), _ = jax.lax.scan(
            frame, state, xs
        )
    score = _lse(pb, pnb)
    # beams come out of top_k sorted by score already, but the final frame's
    # order is by the *pre-merge* pool — re-sort to be safe
    order = jnp.argsort(-score)
    return tokens[order], length[order], score[order]


def greedy_decode(
    logprobas: Array,  # [B, T, V]
    logit_length: Array,  # [B]
    blank_index: Array,  # [] int32
    max_length: int,
    merge_repeats: bool,
) -> Tuple[Array, Array, Array]:
    """Best-path (greedy) decoding — the ``tf.nn.ctc_greedy_decoder``
    analogue, fully vectorised (no scan: argmax + mask + one compaction
    scatter, so it is a handful of XLA ops over ``[B, T]``).

    Per sample: take the arg-max token of every frame ``t < logit_length``,
    collapse consecutive repeats (``merge_repeats=True``, classic topology),
    drop blanks, and left-compact the survivors.

    Returns ``(tokens [B, max_length], lengths [B], scores [B])`` where
    ``scores`` is the log-probability of the greedy frame path (the sum of
    per-frame maxima) and token slots at/after ``lengths`` are zero.
    Decodes longer than ``max_length`` are truncated (length reports the
    clipped value).
    """
    num_b, num_t, _ = logprobas.shape
    lp = logprobas.astype(jnp.float32)
    best_lp = jnp.max(lp, axis=2)  # [B, T]
    am = jnp.argmax(lp, axis=2).astype(jnp.int32)  # [B, T]

    t_ids = jnp.arange(num_t, dtype=jnp.int32)[None, :]
    valid = t_ids < jnp.asarray(logit_length, jnp.int32)[:, None]
    scores = jnp.sum(jnp.where(valid, best_lp, 0.0), axis=1)

    keep = valid & (am != blank_index)
    if merge_repeats:
        prev = jnp.concatenate(
            [jnp.full((num_b, 1), -1, jnp.int32), am[:, :-1]], axis=1
        )
        # frame 0 is always a run start; lengths mask a contiguous prefix,
        # so for t >= 1 the previous frame is valid whenever frame t is
        keep &= am != prev

    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # [B, T]
    lengths = jnp.minimum(pos[:, -1] + 1, max_length)
    # scatter kept tokens to their compacted slot; dropped/overflow frames
    # all land in a sacrificial slot `max_length` that is sliced off (kept
    # in-range slots are written at most once, so order is irrelevant)
    idx = jnp.where(keep & (pos < max_length), pos, max_length)
    tokens = (
        jnp.zeros((num_b, max_length + 1), jnp.int32)
        .at[jnp.arange(num_b, dtype=jnp.int32)[:, None], idx]
        .set(am, mode="drop")[:, :max_length]
    )
    return tokens, lengths, scores


def beam_search(
    logprobas: Array,  # [B, T, V]
    logit_length: Array,  # [B]
    blank_index: Array,  # [] int32
    beam_width: int,
    max_length: int,
    merge_repeats: bool,
) -> Tuple[Array, Array, Array]:
    """Batched prefix beam search; see module docstring.

    Returns ``(tokens [B, K, max_length], lengths [B, K], scores [B, K])``,
    beams sorted by descending total log-probability.
    """
    fn = partial(
        _beam_search_single,
        beam_width=beam_width,
        l_cap=max_length,
        merge_repeats=merge_repeats,
    )
    return jax.vmap(fn, in_axes=(0, 0, None))(
        logprobas, logit_length, blank_index
    )
