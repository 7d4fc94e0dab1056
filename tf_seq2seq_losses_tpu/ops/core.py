"""Shared CTC lattice machinery: input canonicalisation, token scatter, grad/Hessian.

This module is the TPU-native re-design of the reference's
``BaseCtcLossData`` (/root/reference/tf_seq2seq_losses/base_loss.py:102-543).
Differences in kind, not just in dialect:

* The reference is a lazy ``cached_property`` object graph because TF graph
  mode would otherwise recompute; under ``jax.jit`` pure functions get that
  de-duplication from XLA CSE for free, so everything here is a pure function
  of a precomputed :class:`CtcContext`.
* The reference's log-space token scatter ``_select_from_act``
  (base_loss.py:420-468) is built on ``unsorted_segment_*`` scatter kernels.
  On TPU scatters serialise; :func:`select_from_act` instead uses a
  max-normalised one-hot matmul that runs on the MXU
  (``out = M + log(exp(act - M) @ onehot)``).  Global-max (per ``b, t``)
  normalisation is used instead of per-segment max: any segment whose true
  value lies > ~87 nats below the row maximum underflows to ``-inf``, which is
  indistinguishable from 0 probability in float32 once exponentiated — the
  consumers only ever use ``-exp(...)`` of these quantities.
* Dynamic lengths are handled with the reference's own forced-blank trick
  (base_loss.py:378-393): time steps at or beyond ``logit_length`` see a
  log-one-hot(blank) row, making every shape static — exactly what XLA wants.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.utils.numerics import apply_logarithmic_mask

Array = jax.Array
NEG_INF = np.float32(-np.inf)


class CtcContext(NamedTuple):
    """Precomputed, shape-static inputs shared by every lattice computation.

    All tensors are batch-major float32/int32.  ``Lp1`` denotes
    ``labels.shape[1] + 1`` — the static analogue of the reference's dynamic
    ``max_label_length + 1`` (base_loss.py:478-486); the extra, always-masked
    positions contribute exact ``-inf`` lattice entries and never affect
    results.
    """

    logproba: Array  # [B, T, V] log-probs with forced-blank rows past logit_length
    raw_logproba: Array  # [B, T, V] unforced log-probs (kept for parity/debug)
    label: Array  # [B, Lp1] cleaned label: blank-padded past label_length
    preceded_label: Array  # [B, Lp1] label rolled right by one
    label_length: Array  # [B] int32
    logit_length: Array  # [B] int32
    blank_index: Array  # [] int32
    label_length_mask: Array  # [B, Lp1] bool, True for l < label_length
    logit_length_mask: Array  # [B, T] bool, True for t < logit_length
    blank_lp: Array  # [B, T] log-prob of blank
    onehot_label: Array  # [B, Lp1, V] float32 indicator label[b,l] == k
    onehot_preceded: Array  # [B, Lp1, V] float32 indicator preceded[b,l] == k


def make_context(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: Union[int, Array],
) -> CtcContext:
    """Canonicalise inputs (reference: base_loss.py:105-138, 378-418, 488-534)."""
    if logprobas.ndim != 3:
        raise ValueError(f"logprobas must be rank 3, got {logprobas.shape}")
    if labels.ndim != 2:
        raise ValueError(f"labels must be rank 2, got {labels.shape}")
    if label_length.ndim != 1 or logit_length.ndim != 1:
        raise ValueError("label_length and logit_length must be rank 1")
    batch = logprobas.shape[0]
    if labels.shape[0] != batch or label_length.shape[0] != batch or (
        logit_length.shape[0] != batch
    ):
        raise ValueError("inconsistent batch dimensions")
    # Loud dtype checks (reference _verify_inputs, base_loss.py:129-138):
    # a float label would silently truncate under a cast.
    if not jnp.issubdtype(jnp.asarray(logprobas).dtype, jnp.floating):
        raise TypeError(
            f"logprobas/logits must be floating point, got {jnp.asarray(logprobas).dtype}"
        )
    for name, t in (
        ("labels", labels),
        ("label_length", label_length),
        ("logit_length", logit_length),
    ):
        if not jnp.issubdtype(jnp.asarray(t).dtype, jnp.integer):
            raise TypeError(
                f"{name} must be integer typed, got {jnp.asarray(t).dtype}"
            )

    logprobas = logprobas.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    label_length = label_length.astype(jnp.int32)
    logit_length = logit_length.astype(jnp.int32)
    blank = jnp.asarray(blank_index, dtype=jnp.int32)

    _, num_t, num_tokens = logprobas.shape
    lp1 = labels.shape[1] + 1

    # Cleaned label: one extra column, blank past label_length
    # (reference: base_loss.py:395-418).
    padded = jnp.concatenate(
        [labels, jnp.zeros((batch, 1), dtype=jnp.int32)], axis=1
    )
    label_length_mask = jnp.arange(lp1)[None, :] < label_length[:, None]
    label = jnp.where(label_length_mask, padded, blank)
    preceded = jnp.roll(label, shift=1, axis=1)

    # Forced-blank rows past logit_length (reference: base_loss.py:378-393):
    # log-one-hot at the blank token keeps the recursions exact no-ops there.
    logit_length_mask = jnp.arange(num_t)[None, :] < logit_length[:, None]
    blank_row = jnp.where(jnp.arange(num_tokens) == blank, 0.0, NEG_INF).astype(
        jnp.float32
    )
    logproba = jnp.where(
        logit_length_mask[:, :, None], logprobas, blank_row[None, None, :]
    )

    token_ids = jnp.arange(num_tokens)
    onehot_label = (label[:, :, None] == token_ids).astype(jnp.float32)
    onehot_preceded = (preceded[:, :, None] == token_ids).astype(jnp.float32)

    blank_lp = take_blank_logproba(logproba, blank)

    return CtcContext(
        logproba=logproba,
        raw_logproba=logprobas,
        label=label,
        preceded_label=preceded,
        label_length=label_length,
        logit_length=logit_length,
        blank_index=blank,
        label_length_mask=label_length_mask,
        logit_length_mask=logit_length_mask,
        blank_lp=blank_lp,
        onehot_label=onehot_label,
        onehot_preceded=onehot_preceded,
    )


def expected_token_lp(ctx: CtcContext) -> Array:
    """Expected-token log-probs [B, T, Lp1], -inf past label_length
    (reference: base_loss.py:328-344).

    Computed lazily (NOT in :func:`make_context`): it is an O(B*T*L) tensor
    used only by the pure lax.scan path; the Pallas path derives its
    probability-space analogue chunk-wise, and materialising it eagerly
    capped the long-sequence envelope (7.6 GB at B=256, T=4000).
    """
    label_lp = take_token_logprobas(ctx.logproba, ctx.onehot_label)
    return apply_logarithmic_mask(
        label_lp, ctx.label_length_mask[:, None, :]
    )


_CLAMP = np.float32(-1e30)


def take_token_logprobas(logproba: Array, onehot: Array) -> Array:
    """Gather per-label-position token log-probs as a one-hot MXU matmul.

    ``out[b, t, l] = logproba[b, t, label[b, l]]`` where ``onehot[b, l, v]``
    indicates ``label[b, l] == v``.

    TPU gathers along the minor (vocab) axis serialise and cost ~0.4 s at
    ASR scale (measured: B=256, T=500, L=251); the equivalent one-hot
    contraction runs on the MXU in <1 ms.  ``-inf`` entries (forced-blank
    rows, masked tokens) would produce ``-inf * 0 = NaN`` inside the matmul,
    so values are clamped finite and the ``-inf`` pattern is restored from a
    second indicator contraction.
    """
    clamped = jnp.maximum(logproba, _CLAMP)
    # HIGHEST precision: the TPU MXU default is bf16 passes, which would
    # round the *selected log-probs themselves* (~1e-2 relative) — this is an
    # exact gather in disguise, so full f32 is mandatory.
    vals = jnp.einsum(
        "btv,blv->btl",
        clamped,
        onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    was_inf = jnp.einsum(
        "btv,blv->btl",
        jnp.isneginf(logproba).astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    )
    return jnp.where(was_inf > 0.5, NEG_INF, vals)


def take_blank_logproba(logproba: Array, blank: Array) -> Array:
    """``logproba[:, :, blank]`` via a one-hot contraction (same rationale)."""
    num_tokens = logproba.shape[2]
    onehot = (jnp.arange(num_tokens) == blank).astype(jnp.float32)
    clamped = jnp.maximum(logproba, _CLAMP)
    vals = jnp.einsum(
        "btv,v->bt",
        clamped,
        onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    was_inf = jnp.einsum(
        "btv,v->bt",
        jnp.isneginf(logproba).astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    )
    return jnp.where(was_inf > 0.5, NEG_INF, vals)


def select_from_act(act: Array, onehot: Array) -> Array:
    """Log-space scatter of label-indexed activations into token bins, on the MXU.

    ``out[b, a, t, k, d] = logsumexp_{l : onehot[b, l, k] = 1} act[b, a, t, l, d]``

    Reference semantics: ``_select_from_act`` (base_loss.py:420-468) built on
    ``unsorted_segment_logsumexp`` (tools.py:95-119).  Here the reduction is a
    batched matmul over the label axis: ``exp(act - M) @ onehot`` with the
    per-``(b, a, t, d)`` maximum ``M`` factored out for stability.  Empty
    segments (tokens absent from the label) give exactly ``-inf``.

    Args:
        act:    [B, A, T, Lp1, D] float32 (A and D may be 1)
        onehot: [B, Lp1, V] float32 indicator matrix

    Returns: [B, A, T, V, D] float32
    """
    m = jnp.max(act, axis=3, keepdims=True)  # [B, A, T, 1, D]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(act - m_safe)  # zeros where act = -inf
    sums = jnp.einsum(
        "batld,blk->batkd", p, onehot, precision=jax.lax.Precision.HIGHEST
    )
    # double-where: empty segments (sums == 0) must give exactly -inf with a
    # ZERO tangent — a bare log(0) poisons forward-mode derivatives (the
    # O(T)-memory HVP, api.ctc_loss_hessian_vector_product) with NaN
    empty = sums == 0.0
    safe_log = jnp.log(jnp.where(empty, 1.0, sums))
    return m_safe + jnp.where(empty, NEG_INF, safe_log)


def gradient_log(topology, ctx: CtcContext, loss: Array) -> Array:
    """Log of minus the loss gradient w.r.t. log-probabilities.

    Reference: ``logarithmic_logproba_gradient`` (base_loss.py:270-298):
    ``loss  +  combine(alpha[:, :-1], beta[:, 1:])``, filtered to ``-inf`` for
    infinite-loss samples and for time steps past ``logit_length``.
    """
    alpha = topology.alpha(ctx)
    beta = topology.beta(ctx)
    combined = topology.combine(ctx, alpha[:, :-1], beta[:, 1:])
    out = loss[:, None, None] + combined
    out = jnp.where(jnp.isposinf(loss)[:, None, None], NEG_INF, out)
    out = apply_logarithmic_mask(out, ctx.logit_length_mask[:, :, None])
    return out


def gradient(topology, ctx: CtcContext, loss: Array = None, pack=None) -> Array:
    """Analytic loss gradient w.r.t. log-probabilities (base_loss.py:262-268).

    Dispatches to the topology's fused Pallas backward path when available
    (ops/pallas_lattice.py): identical semantics, but beta and the log-space
    combine intermediates never round-trip through HBM.  ``loss`` may be
    None on that path — the kernel recovers it from beta[0] for free.
    ``pack`` optionally carries the alpha tensors saved by the loss forward
    pass so the backward pass skips its own forward scan.
    """
    direct = getattr(topology, "gradient_fast", None)
    if direct is not None:
        return direct(ctx, loss, pack)
    fast = getattr(topology, "gradient_log_fast", None)
    if fast is not None:
        return -jnp.exp(fast(ctx, loss, pack))
    if loss is None:
        loss = topology.loss(ctx, topology.alpha(ctx))
    return -jnp.exp(gradient_log(topology, ctx, loss))


def hessian(topology, ctx: CtcContext, loss: Array) -> Array:
    """Analytic Hessian w.r.t. log-probabilities.

    Mirrors the reference assembly (base_loss.py:186-260): two nested
    ``combine`` contractions against the pairwise transition tensor ``gamma``,
    the diagonal overwritten with the log-gradient, symmetrisation by the
    upper-triangular time mask, then ``H = -exp(.) + g (x) g`` with
    infinite-loss samples and out-of-length rows/columns zeroed.

    Shape: [B, T, V, T, V].  Memory is O(T^2 (L^2 + V^2)) — a small-shape
    feature exactly as in the reference (SURVEY §5 long-context row).
    """
    alpha = topology.alpha(ctx)
    beta = topology.beta(ctx)
    gamma = topology.gamma(ctx)
    grad_log = gradient_log(topology, ctx, loss)
    grad = -jnp.exp(grad_log)

    batch, num_t, num_tokens = ctx.logproba.shape

    # combine(alpha[:, :-1], gamma[:, 1:]) over the start-time lattice
    # (base_loss.py:192-195).
    ag = topology.combine(ctx, alpha[:, :-1], gamma[:, 1:])
    # [B, T, V, T+1, Lp1(, S)] -> drop last start-time slice, combine with beta
    # (base_loss.py:196-199).
    agb = topology.combine(ctx, ag[:, :, :, :-1], beta[:, 1:])
    # [B, T, V, T, V]
    term = loss[:, None, None, None, None] + agb

    # Diagonal := log-gradient (base_loss.py:205-221).
    tv = num_t * num_tokens
    flat = term.reshape(batch, tv, tv)
    diag_idx = jnp.arange(tv)
    flat = flat.at[:, diag_idx, diag_idx].set(grad_log.reshape(batch, tv))
    term = flat.reshape(term.shape)

    # Symmetrise: keep the upper time-triangle, mirror it below
    # (base_loss.py:223-234).
    upper = (
        jnp.arange(num_t)[:, None] <= jnp.arange(num_t)[None, :]
    )[None, :, None, :, None]
    term = jnp.where(upper, term, jnp.transpose(term, [0, 3, 4, 1, 2]))

    hess = -jnp.exp(term) + grad[:, :, :, None, None] * grad[:, None, None, :, :]

    # Zero infinite-loss samples and out-of-length rows/cols
    # (base_loss.py:240-258).
    hess = jnp.where(
        jnp.isposinf(loss)[:, None, None, None, None], 0.0, hess
    )
    tmask = ctx.logit_length_mask
    hess = jnp.where(tmask[:, :, None, None, None], hess, 0.0)
    hess = jnp.where(tmask[:, None, None, :, None], hess, 0.0)
    return hess
