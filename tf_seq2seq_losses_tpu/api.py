"""Public API: drop-in equivalents of the reference's loss functions.

Signatures follow the reference exactly
(/root/reference/tf_seq2seq_losses/classic_ctc_loss.py:33-70,
simplified_ctc_loss.py:32-67): same argument names and order as
``tf.nn.ctc_loss`` with ``logits_time_major=False``, batch-major tensors.

Beyond the reference surface this module adds direct analytic accessors
(:func:`ctc_loss_gradient`, :func:`ctc_loss_hessian`) and the ``*LossData``
classes — eager, cached views over the functional core mirroring the
reference's data objects so that migrating test-suites keep working.
"""

from __future__ import annotations

from functools import cached_property
from typing import Optional, Union

import jax
import jax.numpy as jnp

from tf_seq2seq_losses_tpu.ops import core as _core
from tf_seq2seq_losses_tpu.ops.autodiff import build_chain
from tf_seq2seq_losses_tpu.ops.topology import CLASSIC, SIMPLIFIED
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

Array = jax.Array
IntLike = Union[int, Array]

_CHAINS = {
    "classic": build_chain(CLASSIC),
    "simplified": build_chain(SIMPLIFIED),
}
_TOPOLOGIES = {"classic": CLASSIC, "simplified": SIMPLIFIED}


def _canonical(topology: str):
    if topology not in _TOPOLOGIES:
        raise ValueError(
            f"unknown topology {topology!r}; expected one of {sorted(_TOPOLOGIES)}"
        )
    return _TOPOLOGIES[topology], _CHAINS[topology]


def ctc_loss_from_logproba(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    topology: str = "classic",
) -> Array:
    """CTC loss treating log-probabilities as free parameters.

    Reference: ``ctc_loss_from_logproba`` (base_loss.py:71-99).  Differentiable
    through the custom-VJP chain: first derivative is the analytic gradient,
    second (via ``jax.jacrev`` twice) the analytic Hessian, third raises.
    """
    _, chain = _canonical(topology)
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    return chain.loss_fn(logprobas, labels, label_length, logit_length, blank)


def ctc_loss(
    labels: Array,
    logits: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    topology: str = "classic",
) -> Array:
    """CTC loss from logits.

    Reference: ``ctc_loss`` (base_loss.py:38-68).  Unlike the reference
    (which leaves the log-softmax VJP to TF autodiff), the logits-level
    custom-VJP chain computes it analytically via the posterior identity
    (ops/autodiff.py level 0) — values, gradients and Hessians are
    identical (pinned by tests/test_logits_vjp.py); measured cost is at
    the same ~0.35 ms HBM floor as the generic VJP at V=128 (the identity
    removes the vocab reduction, not the memory passes).
    """
    if jnp.ndim(logits) != 3:
        raise ValueError(
            f"logits must be rank 3 [batch, time, vocab], got shape "
            f"{jnp.shape(logits)}"
        )
    # Accept reduced-precision logits (bf16 encoders): the loss computes in
    # f32; autodiff casts the gradient back to the input dtype.
    logits = jnp.asarray(logits).astype(jnp.float32)
    _, chain = _canonical(topology)
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    return chain.loss_from_logits_fn(
        logits, labels, label_length, logit_length, blank
    )


def classic_ctc_loss(
    labels: Array,
    logits: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike = 0,
) -> Array:
    """Classic (Graves) CTC loss: repeated non-blank labels merge on decode.

    ``a_bb_ccc_c -> abcc``.  Infeasible samples (label needs more logits than
    available, counting the blanks forced between repeats) get ``+inf`` loss
    and zero gradient.  Reference: classic_ctc_loss.py:33-70.
    """
    return ctc_loss(
        labels, logits, label_length, logit_length, blank_index, "classic"
    )


def simplified_ctc_loss(
    labels: Array,
    logits: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike = 0,
) -> Array:
    """Simplified CTC loss: blanks removed, no repeated-token merge.

    ``a_bb_ccc_c -> abbccccc``.  Reference: simplified_ctc_loss.py:32-67.
    """
    return ctc_loss(
        labels, logits, label_length, logit_length, blank_index, "simplified"
    )


def ctc_loss_gradient(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    topology: str = "classic",
) -> Array:
    """Analytic loss gradient w.r.t. ``logprobas`` without autodiff plumbing."""
    _, chain = _canonical(topology)
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    return chain.grad_fn(logprobas, labels, label_length, logit_length, blank)


def ctc_loss_hessian(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    topology: str = "classic",
) -> Array:
    """Analytic Hessian [B, T, V, T, V] w.r.t. ``logprobas``.

    O(T^2 L^2) memory — use at small shapes only, exactly like the reference
    (SURVEY §5; reference tests keep T <= 4)."""
    _, chain = _canonical(topology)
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    return chain.hessian_fn(logprobas, labels, label_length, logit_length, blank)


def ctc_token_posteriors(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    topology: str = "classic",
) -> Array:
    """Per-frame token posteriors ``P(token v emitted at frame t | labels)``.

    For CTC, minus the loss gradient w.r.t. log-probabilities IS the
    posterior occupancy (each valid frame's posteriors sum to exactly 1;
    frames past ``logit_length`` and infeasible samples are all-zero) —
    the standard soft-alignment / confidence tool for ASR.  Runs on the
    fused kernel path: [B, T, V], O(T) memory.
    """
    return -ctc_loss_gradient(
        labels, logprobas, label_length, logit_length, blank_index, topology
    )


def ctc_forced_alignment(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    topology: str = "classic",
) -> tuple:
    """Viterbi forced alignment: ``(alignment [B, T] int32, path_logproba
    [B])``.

    ``alignment[b, t]`` is the token (or blank) the single most probable
    valid CTC path emits at frame ``t``; ``path_logproba`` is that path's
    log-probability (``-inf`` for infeasible samples, whose frames come
    back all-blank; frames past ``logit_length`` are blank).  The standard
    companion operation for CTC acoustic models — frame labelling,
    segmentation — which the reference library does not expose.  Same
    lattices as the losses (ops/align.py) with ``max``/argmax in place of
    ``logsumexp``; pure ``lax.scan``, jit-compatible.
    """
    from tf_seq2seq_losses_tpu.ops import align as _align

    topo, _ = _canonical(topology)
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    ctx = _core.make_context(labels, logprobas, label_length, logit_length, blank)
    fn = (
        _align.classic_viterbi
        if topo.name == "classic"
        else _align.simplified_viterbi
    )
    path_lp, alignment = fn(ctx)
    return alignment, path_lp


def ctc_sample_alignments(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    key: Array,
    num_samples: int = 1,
    topology: str = "classic",
) -> tuple:
    """Exact samples from the alignment posterior ``P(path | label, logits)``:
    ``(alignments [B, S, T] int32, path_logprobas [B, S])``.

    Forward-filtering backward-sampling over the same lattices the losses
    use (ops/sample.py): one alpha pass shared by all ``S`` samples, then a
    Gumbel-max categorical walk backwards over each frame's <=3 predecessor
    candidates.  Completes the alignment toolset: soft
    (:func:`ctc_token_posteriors`), hard argmax
    (:func:`ctc_forced_alignment`), and now stochastic draws — for
    minimum-Bayes-risk / sampled sequence training, alignment uncertainty,
    and segmentation augmentation.  Frames past ``logit_length`` are blank;
    infeasible samples return ``-inf`` path log-prob and all-blank
    alignments.  The reference library exposes losses only.
    """
    from tf_seq2seq_losses_tpu.ops import sample as _sample

    topo, _ = _canonical(topology)
    if num_samples < 1:
        raise ValueError(f"num_samples must be >= 1, got {num_samples}")
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    ctx = _core.make_context(
        labels, logprobas, label_length, logit_length, blank
    )
    fn = (
        _sample.classic_sample
        if topo.name == "classic"
        else _sample.simplified_sample
    )
    return fn(ctx, key, num_samples)


def ctc_greedy_decode(
    logprobas: Array,
    logit_length: Array,
    blank_index: IntLike,
    topology: str = "classic",
    max_length: Optional[int] = None,
) -> tuple:
    """Best-path (greedy) decoding: ``(tokens [B, Lcap], lengths [B],
    log_probs [B])`` — the ``tf.nn.ctc_greedy_decoder`` analogue.

    Arg-max token per frame below ``logit_length``, consecutive repeats
    collapsed for ``topology='classic'`` (plain blank removal for
    ``'simplified'``), blanks dropped, survivors left-compacted; the score
    is the greedy frame path's log-probability.  Fully vectorised (no
    scan), so it is effectively free next to the loss.  Greedy is the
    standard fast approximation: for the exact highest-probability
    *alignment* (Viterbi) use :func:`ctc_forced_alignment`; for better
    *label sequences* (paths marginalised per prefix) use
    :func:`ctc_beam_search_decode`.
    """
    from tf_seq2seq_losses_tpu.ops import decode as _decode

    topo, _ = _canonical(topology)
    if logprobas.ndim != 3:
        raise ValueError(f"logprobas must be rank 3, got {logprobas.shape}")
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    l_cap = logprobas.shape[1] if max_length is None else max_length
    return _decode.greedy_decode(
        logprobas,
        jnp.asarray(logit_length, jnp.int32),
        blank,
        l_cap,
        topo.name == "classic",
    )


def ctc_beam_search_decode(
    logprobas: Array,
    logit_length: Array,
    blank_index: IntLike,
    beam_width: int = 8,
    topology: str = "classic",
    max_length: Optional[int] = None,
) -> tuple:
    """CTC prefix beam search: ``(tokens [B, K, Lcap], lengths [B, K],
    log_probs [B, K])``, beams sorted by descending total probability.

    jit-compatible static-shape prefix beam search (ops/decode.py): exact
    duplicate-prefix merging via dual rolling hashes + lexsort inside a
    ``lax.scan``; with ``beam_width`` >= the number of reachable prefixes
    the returned scores are the sequences' exact total CTC probabilities
    (the enumeration-oracle tests pin this).  ``topology='classic'`` is
    standard CTC decoding (repeat-collapse), ``'simplified'`` plain blank
    removal.  Frames past ``logit_length`` are ignored.  The decode side
    is absent from the reference library entirely.
    """
    from tf_seq2seq_losses_tpu.ops import decode as _decode

    topo, _ = _canonical(topology)
    if logprobas.ndim != 3:
        raise ValueError(f"logprobas must be rank 3, got {logprobas.shape}")
    if beam_width < 1:
        raise ValueError(f"beam_width must be >= 1, got {beam_width}")
    blank = jnp.asarray(blank_index, dtype=jnp.int32)
    l_cap = logprobas.shape[1] if max_length is None else max_length
    return _decode.beam_search(
        logprobas,
        jnp.asarray(logit_length, jnp.int32),
        blank,
        beam_width,
        l_cap,
        topo.name == "classic",
    )


def ctc_loss_hessian_vector_product(
    labels: Array,
    logprobas: Array,
    label_length: Array,
    logit_length: Array,
    blank_index: IntLike,
    vector: Array,
    topology: str = "classic",
) -> Array:
    """``Hessian @ vector`` [B, T, V] in **O(B·T·(L+V)) memory**.

    Forward-mode differentiation of the analytic gradient recursions
    (alpha/beta scans + combine): the dual carries double the first-order
    work instead of materialising the O(T²L²) ``gamma`` lattice, so exact
    second-order information (Newton/CG, curvature diagnostics, GGN
    products) is available at ASR scale — a capability the reference
    fundamentally lacks (its Hessian requires the full pairwise lattice,
    classic_ctc_loss.py:167-308).

    Exactly equals
    ``einsum('btvxy,bxy->btv', ctc_loss_hessian(...), vector)``; infeasible
    samples and steps past ``logit_length`` contribute exact zeros.
    """
    topo, _ = _canonical(topology)
    blank = jnp.asarray(blank_index, dtype=jnp.int32)

    def analytic_grad(lp):
        ctx = _core.make_context(labels, lp, label_length, logit_length, blank)
        loss = topo.loss(ctx, topo.alpha(ctx))
        return -jnp.exp(_core.gradient_log(topo, ctx, loss))

    # cast BOTH primal and tangent: jax.jvp requires equal dtypes, and every
    # other api entry accepts reduced-precision logprobas (make_context's
    # cast happens after the jvp boundary)
    logprobas = jnp.asarray(logprobas, dtype=jnp.float32)
    vector = jnp.asarray(vector, dtype=jnp.float32)
    if vector.shape != logprobas.shape:
        raise ValueError(
            "ctc_loss_hessian_vector_product: vector must match logprobas "
            f"shape {logprobas.shape}, got {vector.shape}"
        )
    _, hvp = jax.jvp(analytic_grad, (logprobas,), (vector,))
    return hvp


class BaseCtcLossData:
    """Eager, cached view over the functional core for one input batch.

    Mirrors the reference's data objects
    (base_loss.py:102-543) so reference-style tests and notebooks port
    directly: ``.alpha``, ``.beta``, ``.gamma``, ``.loss``, ``.gradient``,
    ``.hessian`` and ``.logarithmic_logproba_gradient`` are all lazy cached
    properties.  The lattice width is the *static* ``labels.shape[1] + 1``
    rather than the reference's dynamic ``max(label_length) + 1``; trailing
    positions are exactly ``-inf`` and never affect results.
    """

    _topology_name = "classic"

    def __init__(
        self,
        labels: Array,
        logprobas: Array,
        label_length: Array,
        logit_length: Array,
        blank_index: IntLike = 0,
    ):
        self._topology, self._chain = _canonical(self._topology_name)
        self._ctx = _core.make_context(
            jnp.asarray(labels),
            jnp.asarray(logprobas),
            jnp.asarray(label_length),
            jnp.asarray(logit_length),
            blank_index,
        )

    @cached_property
    def alpha(self) -> Array:
        return self._topology.alpha(self._ctx)

    @cached_property
    def beta(self) -> Array:
        return self._topology.beta(self._ctx)

    @cached_property
    def gamma(self) -> Array:
        return self._topology.gamma(self._ctx)

    @cached_property
    def loss(self) -> Array:
        return self._topology.loss(self._ctx, self.alpha)

    @cached_property
    def logarithmic_logproba_gradient(self) -> Array:
        return _core.gradient_log(self._topology, self._ctx, self.loss)

    @cached_property
    def gradient(self) -> Array:
        return -jnp.exp(self.logarithmic_logproba_gradient)

    @cached_property
    def hessian(self) -> Array:
        return _core.hessian(self._topology, self._ctx, self.loss)


class ClassicCtcLossData(BaseCtcLossData):
    """Classic topology data object (reference: classic_ctc_loss.py:73-115)."""

    _topology_name = "classic"


class SimplifiedCtcLossData(BaseCtcLossData):
    """Simplified topology data object (reference: simplified_ctc_loss.py:70)."""

    _topology_name = "simplified"
