"""Pallas TPU kernels for the CTC lattice scans — block-float probability space.

The hot loop of the whole framework is the sequential time recursion with a
small per-step lattice update (reference: the ``tf.while_loop`` inside
``unfold``, tools.py:191-277 — "the main computational bottleneck is the
iteration over the logit length", README.md:105-110).

Measured on a v5e, a Pallas kernel at these shapes is HBM-bound: an empty
scan over the transition tensors costs ~0.7 ms at B=256, T=500, L=256 and the
full step math only ~0.2 ms more, while log-space ``logaddexp`` math costs
~2.3 ms more (VPU transcendentals).  The design follows:

* **Probability space, block-float carries.**  The lattice carry is an f32
  mantissa per lane plus a per-lane ``int32`` exponent (value = mantissa *
  2^exp), renormalised every step by IEEE-754 exponent-field bit surgery —
  exact, a handful of integer ops, zero transcendentals, and *unlimited*
  dynamic range (a plain f32 carry flushes lattice states more than ~87 nats
  below the row maximum, which at random initialisation hits ~10% of samples
  at T=500).  Mass is only discarded when 2^-126 smaller than the dominant
  mass arriving at the *same lattice point* — the same relative-error
  contract as the pure path's max-normalised scatter (ops/core.py).
* **Transitions are plain softmax probabilities** gathered from
  ``exp(logproba)`` by one-hot MXU matmuls.  The one-hots are padded, so the
  gathers emit kernel-ready padded tensors directly — no ``jnp.pad`` copies
  of [B, T, L] tensors anywhere.  In-kernel per-sample contractions were
  measured and rejected: a Mosaic batch-dim ``dot_general`` runs 500x slower
  than the XLA einsum and lane-slice broadcasts are worse
  (benchmarks/diag_batched_dot.py), so the two transition gathers stay in
  XLA.
* **Residual-free backward pass (round 2).**  The forward kernel emits only
  *per-time-block boundary carries* ``[B, T/bt, L]`` — bt-times smaller than
  the full alpha lattice.  The fused backward kernel re-runs the forward
  recursion inside each time block from its boundary carry (VMEM scratch,
  never HBM), then scans beta backwards emitting gradient acts.  This is a
  kernel-level ``jax.checkpoint``: it removes the three [B, T, L] alpha
  residual tensors (~0.8 GB of HBM round-trips at B=256, T=500) for one extra
  O(T) pass of cheap step math, and caps gradient memory at O(B*T*V) —
  T=4000 at B=256 now fits the chip.
* **Loss-normalised act emission (round 2).**  Every (b, t) slice of
  gradient acts sums to exp(-loss[b]) (each path crosses exactly one
  transition per step — the alpha/beta invariant of
  test_classic_ctc_loss.py:146-167).  The backward kernel therefore scales
  acts by the *per-sample scalar* ``2^(e_act - Ebi)``, ``Ebi =
  floor(-loss/ln2)``, making every emitted act a posterior in [0, 2] — f32
  with no companion exponent tensor (two fewer [B, T, L] outputs, ~0.5 GB
  of traffic).  No cross-lane reductions are needed in-kernel (measured at
  ~3 ms per scan when tried).  The token scatter stays in XLA as a batched
  one-hot MXU matmul; the blank column is recovered from the posterior
  identity ``sum_v -grad[b,t,v] = 1``.
* A single f32 transition probability still flushes to 0 below ~1e-38; a
  feasible sample whose loss depends on such a transition (logits saturated
  beyond ~87 nats, e.g. the reference's 1e10 stability tests) comes out
  ``+inf`` from the fast path and is rerouted by the runtime guard in
  ops/topology.py to the exact log-space pure path.

Batch and time are padded to block multiples with no-op steps (blank
probability 1, all other transitions 0), which provably leave the used
outputs unchanged (same argument as the reference's forced-blank rows,
base_loss.py:378-393).  The label axis is lane-padded to a multiple of 128
with zero probabilities so the diagonal step is a single lane roll
(``pltpu.roll``); wrap-around lanes always carry probability 0 and their
stale exponents are masked to -2^30 so they can never inflate a real lane's
scale.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_seq2seq_losses_tpu.ops import classic as classic_mod
from tf_seq2seq_losses_tpu.ops.core import CtcContext
from tf_seq2seq_losses_tpu.utils.config import get_config

Array = jax.Array
NEG_INF = np.float32(-np.inf)
LN2 = np.float32(0.6931471805599453)
_EBIG = np.int32(1 << 30)  # "minus infinity" for int exponents


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cfg_jit(fn):
    """jit keyed on the (frozen, hashable) KernelConfig, not just shapes.

    Every impl below reads ``get_config()`` at trace time (block geometry,
    window length, chunking, interpret mode); a plain ``@jax.jit`` keyed on
    array shapes would silently return a stale executable after
    ``config_override`` changed any of those knobs at the same shapes.
    Each distinct config gets its own jitted callable (and its own XLA trace
    cache); the config is read once, at call time, consistently with the
    trace that follows.  The cache is a small LRU (config-sweeping loops —
    benchmarks/diag_*, long-lived processes using ``config_override`` —
    would otherwise retain an executable per visited point of a 15-field
    product space for the process lifetime).
    """
    import threading
    from collections import OrderedDict

    cache = OrderedDict()
    max_entries = 32
    # get/move_to_end/popitem/insert are not atomic as a sequence: without
    # the lock, concurrent first calls from multiple threads could corrupt
    # the OrderedDict or double-compile (ADVICE r3).  jax.jit callables are
    # themselves thread-safe once inserted; only the LRU bookkeeping locks.
    lock = threading.Lock()

    def _fresh_identity(f):
        # CRITICAL: ``jax.jit(fn)`` wrappers over the SAME function object
        # share JAX's underlying trace cache (keyed on fn identity +
        # abstract args) — so two cache entries built as ``jax.jit(fn)``
        # would silently replay the FIRST config's trace at unchanged
        # shapes, which is exactly the staleness this keying exists to
        # prevent (found round 5: a fused-epilogue trace poisoned the
        # following half_stream row's residual-pack structure on the chip,
        # and lever A/Bs at config-invariant shapes measured one
        # executable).  A per-config closure gives each entry a distinct
        # function identity and therefore a private trace cache.
        @functools.wraps(f)
        def per_cfg(*a):
            return f(*a)

        return per_cfg

    @functools.wraps(fn)
    def wrapper(*args):
        cfg = get_config()
        with lock:
            jitted = cache.get(cfg)
            if jitted is None:
                while len(cache) >= max_entries:
                    cache.popitem(last=False)
                jitted = cache[cfg] = jax.jit(_fresh_identity(fn))
            else:
                cache.move_to_end(cfg)
        return jitted(*args)

    wrapper._cache = cache  # introspection hook for tests
    return wrapper


def _fit_blocks(
    lpad: int, num_big_buffers: int, num_t: int, batch: int
) -> Tuple[int, int]:
    """Pick (block_batch, block_time) whose VMEM working set fits the core.

    Model: ``num_big_buffers * bb * bt * lpad * 4 bytes * 2 (double
    buffering) * 2 (allocator slack)`` against a 36 MB budget.  The model is
    deliberately conservative (~4x the real VMEM need); 36 MB admits the
    measured-optimal (64, 16) blocks at the benchmark shape (3.79 ms vs
    4.15 ms at the old 12 MB budget's (32, 8) — benchmarks/sweep_v3.py)
    while still shrinking correctly for wide-lattice long-T geometries.
    """
    cfg = get_config()
    budget = cfg.vmem_budget_mb << 20
    bb = min(cfg.block_batch, max(batch, 1))
    bt = min(cfg.block_time, max(num_t, 1))
    if bt < max(num_t, 1):
        # Mosaic requires the sublane (time) block dim to be a multiple of 8
        # unless it spans the whole axis.
        bt = max(8, (bt // 8) * 8)

    def est(bb_, bt_):
        return num_big_buffers * bb_ * bt_ * lpad * 4 * 2 * 2

    while est(bb, bt) > budget and bt > 8 and bt < max(num_t, 1):
        bt = max(8, (bt // 2 // 8) * 8)
    while est(bb, bt) > budget and bb > 8:
        bb //= 2
    return bb, bt


# Buffer count used for every kernel participating in the gradient path:
# the forward bound-mode and the backward kernel must agree on (bb, bt) so
# the boundary-carry pack lines up.  Streams: dc, pt in + ph, pd out (4 big)
# + 3 per-step alpha scratch blocks (not double-buffered, but the allocator
# slack in the model covers them).
_NBUF_GRAD = 8


def _chunk_plan(num_t: int, bt: int):
    """(n_chunks, chunk_t, tpad): split the padded time axis into equal
    bt-aligned chunks no longer than ``config.chunk_time`` (the long-T
    memory cap: [B, T, L] tensors only ever materialise chunk-wide)."""
    tpad0 = _round_up(max(num_t, 1), bt)
    cmax = max(bt, _round_up(get_config().chunk_time, bt))
    n_chunks = -(-tpad0 // cmax)
    n_tb_c = -(-(tpad0 // bt) // n_chunks)
    chunk_t = n_tb_c * bt
    return n_chunks, chunk_t, chunk_t * n_chunks


def _grad_geometry(batch: int, num_t: int, lp1: int):
    lpad = _round_up(lp1, 128)
    bb, bt = _fit_blocks(lpad, _NBUF_GRAD, num_t, batch)
    bpad = _round_up(batch, bb)
    n_chunks, chunk_t, tpad = _chunk_plan(num_t, bt)
    return bpad, tpad, lpad, bb, bt, n_chunks, chunk_t


def _use_stream(n_chunks: int) -> bool:
    """Streamed-residual gradient scheme: single-chunk geometries only (the
    chunked long-T path keeps the residual-free block recompute — streamed
    residuals are O(B*T*L) HBM).  Producer (loss_and_pack) and consumer
    (grad impl) both recompute this same static predicate under the same
    config (the jit caches are config-keyed), so the pack layout always
    matches."""
    return get_config().stream_residuals and n_chunks == 1


def _sort_ctx(ctx: CtcContext):
    """(ctx sorted by logit_length ascending, inverse permutation).

    Sorting makes batch blocks length-homogeneous so the kernels' whole-cell
    skip (see _classic_fwd_kernel) actually fires; stable order keeps the
    permutation deterministic between the pack producer and consumer.
    ``raw_logproba`` (parity/debug only, unused by the kernel path) is
    aliased to the gathered ``logproba`` instead of paying a second
    [B, T, V] gather."""
    perm = jnp.argsort(ctx.logit_length, stable=True)
    inv = jnp.argsort(perm, stable=True)

    def take(name, x):
        return jnp.take(x, perm, axis=0)

    fields = {
        name: take(name, getattr(ctx, name))
        for name in ctx._fields
        if name not in ("blank_index", "raw_logproba")
    }
    fields["blank_index"] = ctx.blank_index
    fields["raw_logproba"] = fields["logproba"]
    return CtcContext(**fields), inv


def _sort_active(ctx: CtcContext) -> bool:
    """Static cost model for batch sorting: the permute passes cost
    ~2 x [B, T, V] of HBM, the skip saves ~19% of the (V-independent,
    L-proportional) kernel time.  Measured on v5e: sorting wins at
    V=32 / L~256 and loses at V=128 / L~256; the crossover sits around
    ``4 V ~ Lpad``."""
    if not get_config().sort_by_length:
        return False
    num_tokens = ctx.logproba.shape[2]
    lpad = _round_up(ctx.label.shape[1], 128)
    return num_tokens * 4 <= lpad


def _padded_lens(ctx: CtcContext, bpad: int) -> Array:
    lens = ctx.logit_length.astype(jnp.int32)
    return jnp.pad(lens, (0, bpad - lens.shape[0]))[:, None]


# ---------------------------------------------------------------------------
# block-float primitives (inside kernels)
# ---------------------------------------------------------------------------


def _expfield(x):
    """IEEE-754 exponent field of f32 (int32, 0 for zeros/denormals)."""
    return (jax.lax.bitcast_convert_type(x, jnp.int32) >> 23) & 0xFF


def _pow2(k):
    """2^k as f32 for int32 k in [-126, 127]; k <= -127 gives exactly 0."""
    kc = jnp.clip(k, -126, 127)
    f = jax.lax.bitcast_convert_type((kc + 127) << 23, jnp.float32)
    return jnp.where(k <= -127, 0.0, f)


def _pow2_nonpos(k):
    """2^min(k, 0): scale-to-max factors; immune to +BIG garbage exponents."""
    return _pow2(jnp.minimum(k, 0))


def _renorm(values, e):
    """Renormalise mantissas to ~[1, 2) by their elementwise max; returns
    (scaled values, new exponent).  Zero lanes keep their exponent."""
    m = values[0]
    for v in values[1:]:
        m = jnp.maximum(m, v)
    ef = _expfield(m)
    delta = jnp.where(ef == 0, 0, ef - 127)
    s = _pow2(-delta)
    return [v * s for v in values], e + delta


def _iroll(x, shift):
    """Lane roll for int32 (via f32 bitcast, bit pattern preserved)."""
    f = jax.lax.bitcast_convert_type(x, jnp.float32)
    f = pltpu.roll(f, shift=shift, axis=1)
    return jax.lax.bitcast_convert_type(f, jnp.int32)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


# ---------------------------------------------------------------------------
# padded probability-space inputs (no [B, T, L] pad copies: the one-hots are
# padded so the MXU gathers emit kernel-ready padded tensors directly)
# ---------------------------------------------------------------------------


def _padded_probs(ctx: CtcContext, bpad: int, tpad: int):
    """exp(logproba) padded to [bpad, tpad, V] (zeros) + blank [bpad, tpad]
    padded with 1 (the no-op step)."""
    batch, num_t, _ = ctx.logproba.shape
    probs = jnp.exp(ctx.logproba)
    probs = jnp.pad(
        probs, ((0, bpad - batch), (0, tpad - num_t), (0, 0)),
        constant_values=0.0,
    )
    blank = jnp.pad(
        jnp.exp(ctx.blank_lp),
        ((0, bpad - batch), (0, tpad - num_t)),
        constant_values=1.0,
    )
    return probs, blank[:, :, None]


def _padded_onehot(label: Array, num_tokens: int, bpad: int, lpad: int):
    """One-hot [bpad, lpad, V]; padded positions match no token.

    Stored bf16: 0/1 are exact, the consuming einsums run at HIGH (bf16x3
    passes) anyway, and the [B, Lpad, V] operands are pure HBM traffic —
    half the bytes at V=128 scale."""
    batch, lp1 = label.shape
    lab = jnp.pad(
        label, ((0, bpad - batch), (0, lpad - lp1)), constant_values=-1
    )
    return (lab[:, :, None] == jnp.arange(num_tokens)[None, None, :]).astype(
        jnp.bfloat16
    )


def _pad_mask(mask: Array, bpad: int, lpad: int):
    batch, lp1 = mask.shape
    return jnp.pad(
        mask.astype(jnp.float32),
        ((0, bpad - batch), (0, lpad - lp1)),
        constant_values=0.0,
    )


def _classic_gather_level(ctx: CtcContext, bpad: int, tpad: int, lpad: int):
    """Full-T small tensors and per-sample matrices for the transition prep:
    (probs [bpad,tpad,V], blank [bpad,tpad,1], oh_label_masked, oh_prec,
    nb_mask, rep_mask)."""
    num_tokens = ctx.logproba.shape[2]
    probs, blank = _padded_probs(ctx, bpad, tpad)
    oh_label = _padded_onehot(ctx.label, num_tokens, bpad, lpad)
    oh_prec = _padded_onehot(ctx.preceded_label, num_tokens, bpad, lpad)
    # fold the label-length mask into the one-hot (zero rows)
    lm = _pad_mask(ctx.label_length_mask, bpad, lpad)
    oh_label_masked = oh_label * lm[:, :, None].astype(jnp.bfloat16)
    nb_mask = _pad_mask(
        ctx.preceded_label != ctx.blank_index, bpad, lpad
    )
    rep_mask = _pad_mask(
        ctx.label != jnp.roll(ctx.label, shift=1, axis=1), bpad, lpad
    )
    return probs, blank, oh_label_masked, oh_prec, nb_mask, rep_mask, lm, \
        oh_label


def _classic_chunk_transitions(probs, oh_label_masked, oh_prec, ohu=None):
    """``dcpt [B, T, 2*Lpad]``: expected-token probabilities (first lane
    half, length-masked) and preceded-token probabilities (second half) from
    ONE concat matmul.  The kernels derive ``pm = pt * nb_mask``
    (repeat-horizontal, blank excluded — classic_ctc_loss.py:528-543) and
    ``do = dc * rep_mask`` (repetition-masked diagonal —
    classic_ctc_loss.py:465-501) on the fly, slicing the halves on the lane
    axis (static, 128-aligned).

    One matmul reads the V-proportional ``probs`` operand once; feeding the
    un-split [B, T, 2L] tensor straight to the kernels avoids the two XLA
    slice copies that made the split form 0.85 ms slower at V=32.
    One-hot selection of *probabilities*: each output has one nonzero
    summand, so bf16x3 passes (HIGH) reproduce it to ~2^-21 relative —
    unlike the log-space gathers in ops/core.py, which must stay HIGHEST.
    """
    if ohu is not None and get_config().fold_pt:
        # folded (config.fold_pt): ONE unmasked expected-token tensor
        # ``dcu [B, T, Lpad]``; the kernels derive ``dc = dcu * lm`` and
        # ``pt = roll(dcu, 1)`` per step (_step_transitions) — half the
        # HBM stream of the concat form
        return jnp.einsum(
            "btv,blv->btl", probs, ohu,
            precision=jax.lax.Precision.HIGH,
        )
    oh_cat = jnp.concatenate([oh_label_masked, oh_prec], axis=1)
    return jnp.einsum(
        "btv,blv->btl", probs, oh_cat,
        precision=jax.lax.Precision.HIGH,
    )


def _classic_padded_inputs(ctx: CtcContext, bpad: int, tpad: int, lpad: int):
    """(blank, dc, pt, nb_mask, rep_mask, onehot_label_p, onehot_prec_p)
    with full-T transition tensors (the single-chunk path)."""
    probs, blank, ohlm, ohp, nb_mask, rep_mask, _lm, _ohu = \
        _classic_gather_level(ctx, bpad, tpad, lpad)
    dcpt = _classic_chunk_transitions(probs, ohlm, ohp)
    return blank, dcpt, nb_mask, rep_mask, ohlm, ohp


def _simplified_gather_level(ctx: CtcContext, bpad: int, tpad: int, lpad: int):
    """(probs, blank, oh_label_masked) for the single-state lattice."""
    num_tokens = ctx.logproba.shape[2]
    probs, blank = _padded_probs(ctx, bpad, tpad)
    oh_label = _padded_onehot(ctx.label, num_tokens, bpad, lpad)
    oh_label_masked = oh_label * _pad_mask(ctx.label_length_mask, bpad, lpad)[
        :, :, None
    ].astype(jnp.bfloat16)
    return probs, blank, oh_label_masked


def _simplified_chunk_transitions(probs, oh_label_masked):
    return jnp.einsum(
        "btv,blv->btl", probs, oh_label_masked,
        precision=jax.lax.Precision.HIGH,
    )


def _simplified_padded_inputs(ctx: CtcContext, bpad: int, tpad: int, lpad: int):
    """(blank, diag, onehot_label_p) with the full-T transition tensor."""
    probs, blank, ohlm = _simplified_gather_level(ctx, bpad, tpad, lpad)
    return blank, _simplified_chunk_transitions(probs, ohlm), ohlm


def _ebi_from_loss(loss: Array, bpad: int) -> Array:
    """Per-sample act normaliser ``floor(-loss/ln2)`` [bpad, 1] f32.

    Non-finite losses (infeasible samples, flushed fast losses) normalise by
    2^0; their act rows are garbage that the inf-loss masking in
    ``*_gradient_log_with_loss`` overwrites anyway.
    """
    safe = jnp.where(jnp.isfinite(loss), loss, 0.0)
    ebi = jnp.floor(-safe / LN2)
    return jnp.pad(ebi, (0, bpad - loss.shape[0]))[:, None]


# ---------------------------------------------------------------------------
# classic topology kernels
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# frozen-frame windows
#
# Per-lane exponent maintenance every step costs ~55 VPU ops; measured on the
# chip, the scans are VPU-arithmetic-bound, not HBM-bound (benchmarks/
# sweep_v3.py: block geometry moves the time <8%).  The window scheme opens a
# "frame" every K steps:
#
#   * fold mantissa magnitude into the exponent (true exponent e_t),
#   * take F = running max of e_t over the K source lanes in the direction
#     mass flows (K exact wrap-killed rolls — the frame must cover every
#     lane whose mass can arrive within the window, which bounds mantissa
#     growth at < 2^(K+4): no overflow),
#   * rescale the carries into frame F and precompute the single
#     neighbour-alignment factor s_arr = 2^(F_src - F).
#
# The K steps inside the window are then plain f32 multiply-adds plus one
# lane roll and one fixed-factor multiply — no exponent arithmetic at all.
# Underflow contract: a lane flushes when it falls 2^-126 below the maximum
# of its K-lane neighbourhood within one window (window=1 reproduces the
# per-step scheme exactly).
# ---------------------------------------------------------------------------


def _true_exp(mants, e):
    """Per-lane true exponent e + floor(log2 mantissa); -2^30 for dead lanes."""
    m = mants[0]
    for v in mants[1:]:
        m = jnp.maximum(m, v)
    ef = _expfield(m)
    return jnp.where(ef == 0, -_EBIG, e + (ef - 127))


def _open_window(mants, e, max_lag, forward):
    """Renormalise carries into the window frame.

    Returns ``(rescaled mants, F, s_arr)``: mantissas become
    ``true_value * 2^-F``; ``s_arr`` aligns mass rolled in from the source
    neighbour (lane l-1 for forward alpha, l+1 for backward beta) and is 0
    at the wrap lane, so windowed steps need no explicit wrap masking.
    """
    lpad = e.shape[1]
    shift = 1 if forward else lpad - 1
    kill_lane = 0 if forward else lpad - 1
    lane = _lane_iota(e.shape)

    e_t = _true_exp(mants, e)

    # Windowmax over source lags 0..max_lag by shift doubling (log2 rolls
    # instead of max_lag rolls).  If f covers lags [0, c-1], rolling it by s
    # extends coverage to [0, c+s-1]; the rolled operand's wrapped lanes
    # (the s lanes at the boundary) are killed, so coverage stays exact.
    def kill(x, n):
        if forward:
            return jnp.where(lane < n, -_EBIG, x)
        return jnp.where(lane >= lpad - n, -_EBIG, x)

    f = e_t
    cover = 1
    while cover <= max_lag:
        s = min(cover, max_lag - cover + 1)
        sh = s if forward else lpad - s
        f = jnp.maximum(f, kill(_iroll(f, sh), s))
        cover += s
    # Rescale by the raw carry exponent (e_t folds the mantissa magnitude in
    # and is only the right quantity for the frame max); f >= e_t >= e + ...
    # keeps the result < 2^1, and lanes whose frame sits > 126 doublings
    # above flush to exactly 0.
    r = _pow2(e - f)
    mants = [v * r for v in mants]
    f_src = jnp.where(lane == kill_lane, -_EBIG, _iroll(f, shift))
    s_arr = _pow2(f_src - f)
    return mants, f, s_arr


def _act_factor(fa, fb, ebi):
    """Per-window act scale 2^(Fa + Fb - Ebi) as TWO power-of-two factors.

    A single f32 factor cannot represent |s| > 127; when the alpha/beta
    window frames sit inflated far above a lane's true act exponent (large
    *different-lane* neighbours), the mantissa product compensates in the
    subnormal range and a clipped single factor silently underscaled a
    still-representable act (ADVICE r2).  Two sequential multiplies cover
    |s| <= 252; beyond that either the mantissa product or the true act is
    below the f32 subnormal range, so the result is exactly 0 under either
    scheme.  (f32 exponent sums: the int dead-lane markers would overflow
    int32.)"""
    s = fa.astype(jnp.float32) + fb.astype(jnp.float32) - ebi
    s = jnp.clip(s, -252.0, 252.0).astype(jnp.int32)
    h = s // 2
    return _pow2(h), _pow2(s - h)


def _step_transitions(fold, dcpt_ref, lm_ref, k, lp):
    """(dc, pt) at step k.

    Folded (config.fold_pt): ``dcpt_ref`` holds the single UNMASKED
    expected-token tensor ``dcu``; the masked diagonal is ``dcu * lm`` and
    the preceded-token probabilities are a one-lane roll —
    ``pt[l] = p[label[l-1]] = dcu[l-1]``.  Exactness at the edges: lane 0's
    wraparound picks up ``dcu[lpad-1]`` = 0 (one-hot padding) and is dead
    anyway (no open mass at lattice position 0, ``nb[0] = 0`` since
    ``preceded[0]`` is the appended blank); lane ``lp1`` receives
    ``dcu[lp1-1] = p[blank]`` instead of 0, but that lane is structurally
    dead (its alpha/beta mass is exactly 0: ``dc``/``do``/``pm`` vanish on
    every edge into it) and its act contribution is ``a1[lp1] * pt = 0``.
    Unfolded: plain lane-half slices of the concat ``dcpt``."""
    if fold:
        dcu = dcpt_ref[:, k, :]
        return dcu * lm_ref[:], pltpu.roll(dcu, shift=1, axis=1)
    return dcpt_ref[:, k, :lp], dcpt_ref[:, k, lp:]


def _classic_win_step(a0, a1, blank, dc, pm, do, s_arr):
    """One windowed forward step (classic_ctc_loss.py:415-451): pure f32."""
    d = a0 * dc + a1 * do
    arr = pltpu.roll(d, shift=1, axis=1) * s_arr
    n0 = (a0 + a1) * blank
    n1 = a1 * pm + arr
    return n0, n1


def _classic_fwd_kernel(mode: str, block_t: int, k_win: int):
    """Windowed block-float alpha scan (classic_ctc_loss.py:379-451).

    Carry: mantissas (a0 closed, a1 open) [bb, Lpad] f32 + shared per-lane
    exponent e [bb, Lpad] int32 (the frame of the last window).  mode
    'final' emits only the last carry; mode 'bound' additionally emits the
    carry at each time-block boundary (the checkpoint the backward kernel
    re-expands from); mode 'resid' streams the full per-step alpha mantissas
    and per-window frames to HBM so the backward kernel can skip its
    re-expand phase entirely (config.stream_residuals).
    """
    n_win = block_t // k_win

    fold = get_config().fold_pt

    def kernel(i0_ref, i1_ref, ie_ref, lens_ref, blank_ref, dcpt_ref, nb_ref,
               rep_ref, lm_ref, *rest):
        lp = dcpt_ref.shape[2] // (1 if fold else 2)
        sa0_ref = sa1_ref = saf_ref = None
        if mode == "bound":
            b0_ref, b1_ref, be_ref, f0_ref, f1_ref, fe_ref, a0_s, a1_s, e_s = rest
        elif mode == "resid":
            (sa_ref, saf_ref, f0_ref, f1_ref, fe_ref,
             a0_s, a1_s, e_s) = rest
        elif mode == "resid1":
            (sa_ref, saf_ref, b0_ref, be_ref, f0_ref, f1_ref, fe_ref,
             a0_s, a1_s, e_s) = rest
        else:
            f0_ref, f1_ref, fe_ref, a0_s, a1_s, e_s = rest
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            a0_s[:] = i0_ref[:]
            a1_s[:] = i1_ref[:]
            e_s[:] = ie_ref[:]

        if mode in ("bound", "resid1"):
            # carry entering this block == boundary checkpoint ("resid1"
            # checkpoints a0 only: the backward kernel rebuilds the closed
            # state from it with the 2-op recurrence)
            b0_ref[0, :, :] = a0_s[:]
            if mode == "bound":
                b1_ref[0, :, :] = a1_s[:]
            be_ref[0, :, :] = e_s[:]

        # Whole-cell skip: steps at t >= logit_length see forced-blank
        # transitions (blank=1, rest=0); one such step sends the carry to
        # its fixed point (a0+a1, 0), so a cell whose every step lies past
        # the block's max length AND that starts after at least one no-op
        # step (strict <) is provably an identity.  With the batch sorted
        # by length (config.sort_by_length) this skips ~19% of cells at the
        # reference length distribution.  'bound' mode (chunked path) stays
        # unconditional: its boundary pack is consumed block-by-block.
        run = jnp.max(lens_ref[:]) >= j * block_t
        if mode in ("resid", "resid1"):
            # The streamed bwd kernel force-runs the top time block (to
            # apply the backward no-op fixed point to the beta init), so
            # every residual it reads there must have been written: force
            # the top block here too, else a batch block whose max length
            # ends below it would leave sa_ref/saf_ref as uninitialised
            # HBM for that forced bwd read (values were masked downstream,
            # but the garbage intermediates break jax_debug_nans and any
            # future unmasked consumer).
            run = jnp.logical_or(run, j == pl.num_programs(1) - 1)

        def window(w, carry):
            a0, a1, e = carry
            (a0, a1), f, s_arr = _open_window([a0, a1], e, k_win, True)
            if mode in ("resid", "resid1"):
                saf_ref[w, :, :] = f
            for kk in range(k_win):
                k = w * k_win + kk
                if mode == "resid":
                    # one wide store per step (a0 | a1 on the lane axis)
                    sa_ref[:, k, :] = jnp.concatenate([a0, a1], axis=1)
                elif mode == "resid1":
                    sa_ref[:, k, :] = a1
                blank = blank_ref[:, k, :]  # [bb, 1]
                dc, pt = _step_transitions(fold, dcpt_ref, lm_ref, k, lp)
                pm = pt * nb_ref[:]
                do = dc * rep_ref[:]
                a0, a1 = _classic_win_step(a0, a1, blank, dc, pm, do, s_arr)
            return a0, a1, f

        def run_block():
            carry = (a0_s[:], a1_s[:], e_s[:])
            if get_config().unroll:
                for _w in range(n_win):
                    carry = window(_w, carry)
            else:
                carry = jax.lax.fori_loop(0, n_win, window, carry)
            a0_s[:], a1_s[:], e_s[:] = carry

        if mode == "bound":
            run_block()
        else:
            pl.when(run)(run_block)

        if mode == "final":
            f0_ref[:] = a0_s[:]
            f1_ref[:] = a1_s[:]
            fe_ref[:] = e_s[:]
        else:

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                f0_ref[:] = a0_s[:]
                f1_ref[:] = a1_s[:]
                fe_ref[:] = e_s[:]

    return kernel


def _k_win(bt: int) -> int:
    """Window length: largest divisor of bt not exceeding config.window.

    (ADVICE r2: ``gcd(bt, window)`` silently forfeited amortisation for
    non-power-of-two windows, e.g. window=6 with bt=16 gave 2 instead of 4.)
    """
    w = max(1, get_config().window)
    return max(d for d in range(1, bt + 1) if bt % d == 0 and d <= w)


def _alpha_init(bpad: int, lpad: int):
    """Standard t=0 carry: unit mass at lattice position 0, closed state."""
    lane = _lane_iota((bpad, lpad))
    return (
        jnp.where(lane == 0, 1.0, 0.0).astype(jnp.float32),
        jnp.zeros((bpad, lpad), jnp.float32),
        jnp.zeros((bpad, lpad), jnp.int32),
    )


def _classic_fwd_call(blank, dcpt, nb, rep, *, mode, bb, bt, init=None,
                      lens=None, lm=None):
    cfg = get_config()
    bpad, tpad, lpad2 = dcpt.shape
    lpad = lpad2 // (1 if cfg.fold_pt else 2)
    if lm is None:
        # dead input on the unfolded path (kept for a stable kernel
        # signature); the folded path requires the real mask
        assert not cfg.fold_pt, "fold_pt requires the label-length mask"
        lm = jnp.ones((bpad, lpad), jnp.float32)
    if init is None:
        init = _alpha_init(bpad, lpad)
    if lens is None:
        # no skip information: every cell runs (max >= 0 >= j*bt only for
        # j = 0, so use the sentinel "whole axis" length)
        lens = jnp.full((bpad, 1), tpad, jnp.int32)
    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, j, 0))
    big2 = pl.BlockSpec((bb, bt, 2 * lpad), lambda i, j: (i, j, 0))
    small = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, j, 0))
    vec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
    svec = pl.BlockSpec((bb, 1), lambda i, j: (i, 0))
    # time-block index leads so the trailing (bb, lpad) block satisfies
    # Mosaic's (8, 128) tiling constraint
    bound = pl.BlockSpec((1, bb, lpad), lambda i, j: (j, i, 0))

    if mode == "bound":
        out_shape = (
            jax.ShapeDtypeStruct((n_tb, bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((n_tb, bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((n_tb, bpad, lpad), jnp.int32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        )
        out_specs = (bound, bound, bound, vec, vec, vec)
    elif mode == "resid":
        # per-step alpha mantissas (closed | open concatenated on the lane
        # axis: ONE wide store/load per step instead of two) + per-window
        # frames; frames use a leading window index so the trailing
        # (bb, lpad) block satisfies Mosaic's (8, 128) tiling constraint
        kw = _k_win(bt)
        n_w = bt // kw
        frame = pl.BlockSpec((n_w, bb, lpad), lambda i, j: (j, i, 0))
        out_shape = (
            jax.ShapeDtypeStruct((bpad, tpad, 2 * lpad), jnp.float32),
            jax.ShapeDtypeStruct((n_tb * n_w, bpad, lpad), jnp.int32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        )
        out_specs = (big2, frame, vec, vec, vec)
    elif mode == "resid1":
        # open-state mantissas only + per-window frames + per-block a0/e
        # boundary carries (config.half_stream: the backward kernel
        # rebuilds a0 with its 2-op recurrence)
        kw = _k_win(bt)
        n_w = bt // kw
        frame = pl.BlockSpec((n_w, bb, lpad), lambda i, j: (j, i, 0))
        out_shape = (
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((n_tb * n_w, bpad, lpad), jnp.int32),
            jax.ShapeDtypeStruct((n_tb, bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((n_tb, bpad, lpad), jnp.int32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        )
        out_specs = (big, frame, bound, bound, vec, vec, vec)
    else:
        out_shape = (
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        )
        out_specs = (vec, vec, vec)

    dspec = big if cfg.fold_pt else big2
    return pl.pallas_call(
        _classic_fwd_kernel(mode, bt, _k_win(bt)),
        grid=grid,
        in_specs=[vec, vec, vec, svec, small, dspec, vec, vec, vec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Mosaic's default 16 MB scoped-vmem cap rejects the backward
            # kernel at lane widths >= 512 (17.2 MB measured at B=256,
            # T=1000); the chip has far more physical VMEM, so raise it.
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(init[0], init[1], init[2], lens, blank, dcpt, nb, rep, lm)


def _pick_loss(f0, f1, fe, ctx, batch, lp1):
    total = (f0 + f1)[:batch, :lp1]
    e = fe[:batch, :lp1]
    picked = jnp.take_along_axis(total, ctx.label_length[:, None], axis=1)[:, 0]
    picked_e = jnp.take_along_axis(e, ctx.label_length[:, None], axis=1)[:, 0]
    return -(jnp.log(picked) + picked_e.astype(jnp.float32) * LN2)


def _classic_fwd_scan(ctx, bpad, tpad, lpad, bb, bt, n_chunks, chunk_t,
                      emit_checkpoints):
    """Forward pass as a chunk scan; returns (final carry, chunk-initial
    checkpoints or None).  n_chunks == 1 short-circuits to a single call."""
    probs, blank, ohlm, ohp, nb, rep, lm, ohu = _classic_gather_level(
        ctx, bpad, tpad, lpad
    )
    if n_chunks == 1:
        dcpt = _classic_chunk_transitions(probs, ohlm, ohp, ohu)
        if emit_checkpoints:
            b0, b1, be, f0, f1, fe = _classic_fwd_call(
                blank, dcpt, nb, rep, lm=lm, mode="bound", bb=bb, bt=bt
            )
            return (f0, f1, fe), (b0, b1, be)
        return _classic_fwd_call(
            blank, dcpt, nb, rep, lm=lm, mode="final", bb=bb, bt=bt
        ), None

    num_v = probs.shape[2]

    def body(carry, c):
        t0 = c * chunk_t
        probs_c = jax.lax.dynamic_slice(
            probs, (0, t0, 0), (bpad, chunk_t, num_v)
        )
        blank_c = jax.lax.dynamic_slice(blank, (0, t0, 0), (bpad, chunk_t, 1))
        dcpt = _classic_chunk_transitions(probs_c, ohlm, ohp, ohu)
        fin = _classic_fwd_call(
            blank_c, dcpt, nb, rep, lm=lm, mode="final", init=carry,
            bb=bb, bt=bt
        )
        return fin, (carry if emit_checkpoints else None)

    init = _alpha_init(bpad, lpad)
    final, cks = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return final, cks


@_cfg_jit
def _classic_loss_fast_impl(ctx: CtcContext):
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    lpad = _round_up(lp1, 128)
    bb, bt = _fit_blocks(lpad, num_big_buffers=5, num_t=num_t, batch=batch)
    bpad = _round_up(batch, bb)
    n_chunks, chunk_t, tpad = _chunk_plan(num_t, bt)
    (f0, f1, fe), _ = _classic_fwd_scan(
        ctx, bpad, tpad, lpad, bb, bt, n_chunks, chunk_t, False
    )
    return _pick_loss(f0, f1, fe, ctx, batch, lp1)


def classic_loss_fast(ctx: CtcContext) -> Array:
    """Forward-only classic loss; alpha never materialised in HBM.

    ``loss = -logsumexp_s alpha[T]`` gathered at label_length
    (classic_ctc_loss.py:152-165); in probability space the state-logsumexp
    is a plain add: ``loss = -(log(a0 + a1) + e*ln2)`` at the picked lane.
    """
    batch, num_t, _ = ctx.logproba.shape
    if num_t == 0 or batch == 0:
        return classic_mod.loss(ctx, classic_mod.alpha(ctx))
    return _classic_loss_fast_impl(ctx)


@_cfg_jit
def _classic_loss_and_pack_impl(ctx: CtcContext):
    """Loss via the bound-mode kernel, returning the boundary-carry pack.

    Used by the AD forward pass (autodiff.py loss_fwd): the per-block
    boundary carries (bt-times smaller than full alpha) become custom-VJP
    residuals; the backward kernel re-expands each block in VMEM.
    Standalone (undifferentiated) calls keep the lean final-only kernel
    (``classic_loss_fast``).
    """
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    bpad, tpad, lpad, bb, bt, n_chunks, chunk_t = _grad_geometry(
        batch, num_t, lp1
    )
    if _use_stream(n_chunks):
        inv = None
        if _sort_active(ctx):
            ctx, inv = _sort_ctx(ctx)
        probs, blank, ohlm, ohp, nb, rep, lm, ohu = _classic_gather_level(
            ctx, bpad, tpad, lpad
        )
        dcpt = _classic_chunk_transitions(probs, ohlm, ohp, ohu)
        if get_config().half_stream:
            sa, saf, ab0, abe, f0, f1, fe = _classic_fwd_call(
                blank, dcpt, nb, rep, lm=lm, mode="resid1", bb=bb, bt=bt,
                lens=_padded_lens(ctx, bpad),
            )
            boundary = (ab0, abe)
        else:
            sa, saf, f0, f1, fe = _classic_fwd_call(
                blank, dcpt, nb, rep, lm=lm, mode="resid", bb=bb, bt=bt,
                lens=_padded_lens(ctx, bpad),
            )
            boundary = saf
        loss_s = _pick_loss(f0, f1, fe, ctx, batch, lp1)
        loss = loss_s if inv is None else jnp.take(loss_s, inv)
        # pack stays in SORTED order (incl. its loss copy): the grad impl
        # re-derives the same stable permutation from the unsorted ctx;
        # slot 3 carries the a0/e boundary pair under half_stream
        return loss, (sa, saf, boundary, loss_s)
    (f0, f1, fe), cks = _classic_fwd_scan(
        ctx, bpad, tpad, lpad, bb, bt, n_chunks, chunk_t, True
    )
    loss = _pick_loss(f0, f1, fe, ctx, batch, lp1)
    # single-chunk: cks = per-block boundaries; chunked: cks = per-chunk
    # initial carries [n_chunks, bpad, lpad] x3 (the consumer recomputes the
    # same deterministic plan and branches identically)
    return loss, (cks[0], cks[1], cks[2], loss)


def classic_loss_and_pack(ctx: CtcContext):
    batch, num_t, _ = ctx.logproba.shape
    if num_t == 0 or batch == 0:
        return classic_mod.loss(ctx, classic_mod.alpha(ctx)), None
    return _classic_loss_and_pack_impl(ctx)


def _classic_bwd_kernel(block_t: int, k_win: int):
    """Fused residual-free windowed backward kernel
    (classic_ctc_loss.py:349-364, 565-669).

    Phase 1 re-runs the forward recursion across the block from the
    boundary carry (identical windowed ops to the forward kernel, so the
    re-expanded alpha is bit-identical), parking per-step alpha mantissas
    and per-window frames in VMEM scratch.  Phase 2 scans beta backwards in
    its own frozen-frame windows, emitting *loss-normalised posterior acts*:

      ph = a1 * pt * b1          * 2^(Fa + Fb - Ebi)
      pd = (a0*dc + a1*do) * arr * 2^(Fa + Fb - Ebi)

    (``arr`` is the rolled beta already aligned into frame Fb) with
    ``Ebi = floor(-loss/ln2)`` per sample — acts are posteriors, f32 with
    no companion exponent tensor.  Also emits beta[0] (mantissa +
    exponent), from which the loss is recovered for free
    (``loss = -log(alpha[0].beta[0])``, the invariant of
    test_classic_ctc_loss.py:146-167).
    """
    n_win = block_t // k_win
    fold = get_config().fold_pt

    def kernel(
        bi0_ref, bi1_ref, bie_ref, ebi_ref,
        blank_ref, dcpt_ref, nb_ref, rep_ref, lm_ref,
        bb0_ref, bb1_ref, bbe_ref,
        ph_ref, pd_ref, f0_ref, f1_ref, fe_ref,
        sa0, sa1, saf, b0_s, b1_s, e_s,
    ):
        lp = dcpt_ref.shape[2] // (1 if fold else 2)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b0_s[:] = bi0_ref[:]
            b1_s[:] = bi1_ref[:]
            e_s[:] = bie_ref[:]

        # ---- phase 1: re-expand alpha across the block (forward) ----------
        def fwd_window(w, carry):
            a0, a1, e = carry
            (a0, a1), f, s_arr = _open_window([a0, a1], e, k_win, True)
            saf[:, w, :] = f
            for kk in range(k_win):
                k = w * k_win + kk
                sa0[:, k, :] = a0
                sa1[:, k, :] = a1
                blank = blank_ref[:, k, :]
                dc, pt = _step_transitions(fold, dcpt_ref, lm_ref, k, lp)
                pm = pt * nb_ref[:]
                do = dc * rep_ref[:]
                a0, a1 = _classic_win_step(a0, a1, blank, dc, pm, do, s_arr)
            return a0, a1, f

        carry = (bb0_ref[0, :, :], bb1_ref[0, :, :], bbe_ref[0, :, :])
        if get_config().unroll:
            for _w in range(n_win):
                carry = fwd_window(_w, carry)
        else:
            jax.lax.fori_loop(0, n_win, fwd_window, carry)

        # ---- phase 2: beta windows backwards, emitting normalised acts ----
        ebi = ebi_ref[:]  # [bb, 1] f32
        lpad = b1_s.shape[1]

        def bwd_window(wr, carry):
            w = n_win - 1 - wr
            b0, b1, eb = carry
            (b0, b1), fb, s_arr = _open_window([b0, b1], eb, k_win, False)
            s_hi, s_lo = _act_factor(saf[:, w, :], fb, ebi)
            for kk in range(k_win - 1, -1, -1):
                k = w * k_win + kk
                blank = blank_ref[:, k, :]
                dc, pt = _step_transitions(fold, dcpt_ref, lm_ref, k, lp)
                pm = pt * nb_ref[:]
                do = dc * rep_ref[:]
                a0 = sa0[:, k, :]
                a1 = sa1[:, k, :]

                arr = pltpu.roll(b1, shift=lpad - 1, axis=1) * s_arr
                d = a0 * dc + a1 * do
                ph_ref[:, k, :] = (a1 * pt * b1) * s_hi * s_lo
                pd_ref[:, k, :] = d * arr * s_hi * s_lo

                hc = blank * b0
                n0 = hc + dc * arr
                n1 = hc + pm * b1 + do * arr
                b0, b1 = n0, n1
            return b0, b1, fb

        carry = (b0_s[:], b1_s[:], e_s[:])
        if get_config().unroll:
            for _wr in range(n_win):
                carry = bwd_window(_wr, carry)
        else:
            carry = jax.lax.fori_loop(0, n_win, bwd_window, carry)
        b0_s[:], b1_s[:], e_s[:] = carry

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            # full beta carry: chunked callers chain it; at the true t=0,
            # loss = -log(alpha[0] . beta[0]) = -(log b0[l=0] + e*ln2)
            f0_ref[:] = b0_s[:]
            f1_ref[:] = b1_s[:]
            fe_ref[:] = e_s[:]

    return kernel


def _beta_init(ctx: CtcContext, bpad: int, lpad: int):
    """Standard t=T beta carry: one-hot at label_length over both states
    (classic_ctc_loss.py:366-377)."""
    batch = ctx.label_length.shape[0]
    lane_hot = (
        _lane_iota((bpad, lpad))
        == jnp.pad(ctx.label_length, (0, bpad - batch))[:, None]
    ).astype(jnp.float32)
    return lane_hot, lane_hot, jnp.zeros((bpad, lpad), jnp.int32)


def _classic_bwd_call(
    blank, dcpt, nb, rep, bnd0, bnd1, bnde, beta_init, ebi, *, bb, bt,
    lm=None
):
    """beta_init: (b0, b1, e) [bpad, lpad] carry at the end of this span;
    ebi: [bpad, 1] f32 act normaliser; bnd*: [n_tb, bpad, lpad] boundary
    carries.  Returns (ph, pd, beta-final b0/b1/e)."""
    cfg = get_config()
    bpad, tpad, lpad2 = dcpt.shape
    lpad = lpad2 // (1 if cfg.fold_pt else 2)
    if lm is None:
        assert not cfg.fold_pt, "fold_pt requires the label-length mask"
        lm = jnp.ones((bpad, lpad), jnp.float32)
    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    big2 = pl.BlockSpec((bb, bt, 2 * lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    small = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, n_tb - 1 - j, 0))
    vec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
    svec = pl.BlockSpec((bb, 1), lambda i, j: (i, 0))
    bound = pl.BlockSpec((1, bb, lpad), lambda i, j: (n_tb - 1 - j, i, 0))

    big3 = jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32)
    kw = _k_win(bt)
    dspec = big if cfg.fold_pt else big2
    return pl.pallas_call(
        _classic_bwd_kernel(bt, kw),
        grid=grid,
        in_specs=[vec, vec, vec, svec, small, dspec, vec, vec, vec,
                  bound, bound, bound],
        out_specs=(big, big, vec, vec, vec),
        out_shape=(
            big3, big3,
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, bt, lpad), jnp.float32),
            pltpu.VMEM((bb, bt, lpad), jnp.float32),
            pltpu.VMEM((bb, bt // kw, lpad), jnp.int32),
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Mosaic's default 16 MB scoped-vmem cap rejects the backward
            # kernel at lane widths >= 512 (17.2 MB measured at B=256,
            # T=1000); the chip has far more physical VMEM, so raise it.
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(beta_init[0], beta_init[1], beta_init[2], ebi,
      blank, dcpt, nb, rep, lm, bnd0, bnd1, bnde)


def _classic_bwd_kernel_streamed(block_t: int, k_win: int):
    """Single-scan backward kernel over streamed alpha residuals.

    With the forward kernel's 'resid' outputs (per-step alpha mantissas in
    their window frame + per-window frames) streamed back in, the backward
    pass is just the beta windows — no re-expand phase, ~1/3 less VPU work
    on the VPU-bound scans (config.stream_residuals).

    Emits ONE combined act tensor instead of (ph, pd): the horizontal act at
    lane l scatters to token ``label[l-1]`` — the same token the diagonal
    act at lane l-1 scatters to — so ``pc[l] = pd[l] + ph[l+1]`` collapses
    the two scatter matmuls (classic_ctc_loss.py:565-669's blank/non-blank
    split) into a single masked-one-hot einsum and halves the act HBM
    traffic.  ``ph[0] == 0`` always (no open mass at lattice position 0), so
    the roll wrap is clean; the label-length mask in the one-hot is
    satisfied wherever ``ph[l+1]`` is nonzero (open mass at lane l+1 needs
    l+1 <= label_length).
    """
    n_win = block_t // k_win
    fold = get_config().fold_pt

    def kernel(
        bi0_ref, bi1_ref, bie_ref, ebi_ref, lens_ref,
        blank_ref, dcpt_ref, nb_ref, rep_ref, lm_ref,
        sa_ref, saf_ref,
        pc_ref, f0_ref, f1_ref, fe_ref,
        b0_s, b1_s, e_s,
    ):
        lp = dcpt_ref.shape[2] // (1 if fold else 2)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b0_s[:] = bi0_ref[:]
            b1_s[:] = bi1_ref[:]
            e_s[:] = bie_ref[:]

        ebi = ebi_ref[:]  # [bb, 1] f32
        lpad = b1_s.shape[1]

        # Skip cells wholly past the block max length (the backward no-op
        # step (b0, b1) -> (b0, b0) is a fixed point after one application;
        # the highest time block always executes to apply it).  Acts for
        # skipped cells are zeroed: those gradient rows are masked anyway,
        # but the scatter einsum must not read uninitialised VMEM.
        tb = pl.num_programs(1) - 1 - j
        run = jnp.logical_or(
            tb * block_t < jnp.max(lens_ref[:]), j == 0
        )

        def bwd_window(wr, carry):
            w = n_win - 1 - wr
            b0, b1, eb = carry
            (b0, b1), fb, s_arr = _open_window([b0, b1], eb, k_win, False)
            s_hi, s_lo = _act_factor(saf_ref[w, :, :], fb, ebi)
            for kk in range(k_win - 1, -1, -1):
                k = w * k_win + kk
                blank = blank_ref[:, k, :]
                dc, pt = _step_transitions(fold, dcpt_ref, lm_ref, k, lp)
                pm = pt * nb_ref[:]
                do = dc * rep_ref[:]
                a0 = sa_ref[:, k, :lpad]
                a1 = sa_ref[:, k, lpad:]

                arr = pltpu.roll(b1, shift=lpad - 1, axis=1) * s_arr
                d = a0 * dc + a1 * do
                ph_s = (a1 * pt * b1) * s_hi * s_lo
                pd_s = d * arr * s_hi * s_lo
                pc_ref[:, k, :] = pd_s + pltpu.roll(
                    ph_s, shift=lpad - 1, axis=1
                )

                hc = blank * b0
                n0 = hc + dc * arr
                n1 = hc + pm * b1 + do * arr
                b0, b1 = n0, n1
            return b0, b1, fb

        @pl.when(run)
        def _():
            carry = (b0_s[:], b1_s[:], e_s[:])
            if get_config().unroll:
                for _wr in range(n_win):
                    carry = bwd_window(_wr, carry)
            else:
                carry = jax.lax.fori_loop(0, n_win, bwd_window, carry)
            b0_s[:], b1_s[:], e_s[:] = carry

        @pl.when(jnp.logical_not(run))
        def _():
            pc_ref[:] = jnp.zeros_like(pc_ref)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            f0_ref[:] = b0_s[:]
            f1_ref[:] = b1_s[:]
            fe_ref[:] = e_s[:]

    return kernel


def _classic_bwd_call_streamed(
    blank, dcpt, nb, rep, sa, saf, beta_init, ebi, lens, *, bb, bt, lm=None
):
    """Streamed-residual backward: returns (pc combined acts, beta-final
    b0/b1/e)."""
    cfg = get_config()
    bpad, tpad, lpad2 = dcpt.shape
    lpad = lpad2 // (1 if cfg.fold_pt else 2)
    if lm is None:
        assert not cfg.fold_pt, "fold_pt requires the label-length mask"
        lm = jnp.ones((bpad, lpad), jnp.float32)
    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    big2 = pl.BlockSpec((bb, bt, 2 * lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    small = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, n_tb - 1 - j, 0))
    vec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
    svec = pl.BlockSpec((bb, 1), lambda i, j: (i, 0))
    kw = _k_win(bt)
    n_w = bt // kw
    frame = pl.BlockSpec((n_w, bb, lpad), lambda i, j: (n_tb - 1 - j, i, 0))

    dspec = big if cfg.fold_pt else big2
    return pl.pallas_call(
        _classic_bwd_kernel_streamed(bt, kw),
        grid=grid,
        in_specs=[vec, vec, vec, svec, svec, small, dspec, vec, vec, vec,
                  big2, frame],
        out_specs=(big, vec, vec, vec),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(beta_init[0], beta_init[1], beta_init[2], ebi, lens,
      blank, dcpt, nb, rep, lm, sa, saf)


def _classic_bwd_kernel_half(block_t: int, k_win: int):
    """Half-streamed backward kernel (config.half_stream).

    Like _classic_bwd_kernel_streamed but the forward kernel streamed only
    the OPEN mantissas ``a1`` (resid1 mode); phase 1 rebuilds the closed
    state across the block from its a0/e boundary carry with the 2-op
    recurrence ``a0' = (a0 + a1) * blank`` — the same mantissa ops in the
    same per-window frames as the forward kernel (rescaled between windows
    by ``2^(f_prev - f_w)`` from the stored frames), so the rebuilt a0
    matches what resid mode would have streamed up to compiler op-order
    drift (measured: loss 1 ULP, worst gradient element ~5e-6 relative
    after the drift compounds through the scan; pinned by
    tests/test_fold_pt.py::test_half_stream_parity).  Phase 2 is the
    beta/act scan of the streamed kernel reading a0 from VMEM scratch."""
    n_win = block_t // k_win
    fold = get_config().fold_pt

    def kernel(
        bi0_ref, bi1_ref, bie_ref, ebi_ref, lens_ref,
        blank_ref, dcpt_ref, nb_ref, rep_ref, lm_ref,
        sa_ref, saf_ref, ab0_ref, abe_ref,
        pc_ref, f0_ref, f1_ref, fe_ref,
        a0_sc, b0_s, b1_s, e_s,
    ):
        lp = dcpt_ref.shape[2] // (1 if fold else 2)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b0_s[:] = bi0_ref[:]
            b1_s[:] = bi1_ref[:]
            e_s[:] = bie_ref[:]

        ebi = ebi_ref[:]  # [bb, 1] f32
        lpad = b1_s.shape[1]

        tb = pl.num_programs(1) - 1 - j
        run = jnp.logical_or(
            tb * block_t < jnp.max(lens_ref[:]), j == 0
        )

        # ---- phase 1: rebuild a0 forward across the block ---------------
        def a0_window(w, carry):
            a0, e_prev = carry
            f = saf_ref[w, :, :]
            a0 = a0 * _pow2(e_prev - f)
            for kk in range(k_win):
                k = w * k_win + kk
                a0_sc[:, k, :] = a0
                a0 = (a0 + sa_ref[:, k, :]) * blank_ref[:, k, :]
            return a0, f

        def bwd_window(wr, carry):
            w = n_win - 1 - wr
            b0, b1, eb = carry
            (b0, b1), fb, s_arr = _open_window([b0, b1], eb, k_win, False)
            s_hi, s_lo = _act_factor(saf_ref[w, :, :], fb, ebi)
            for kk in range(k_win - 1, -1, -1):
                k = w * k_win + kk
                blank = blank_ref[:, k, :]
                dc, pt = _step_transitions(fold, dcpt_ref, lm_ref, k, lp)
                pm = pt * nb_ref[:]
                do = dc * rep_ref[:]
                a0 = a0_sc[:, k, :]
                a1 = sa_ref[:, k, :]

                arr = pltpu.roll(b1, shift=lpad - 1, axis=1) * s_arr
                d = a0 * dc + a1 * do
                ph_s = (a1 * pt * b1) * s_hi * s_lo
                pd_s = d * arr * s_hi * s_lo
                pc_ref[:, k, :] = pd_s + pltpu.roll(
                    ph_s, shift=lpad - 1, axis=1
                )

                hc = blank * b0
                n0 = hc + dc * arr
                n1 = hc + pm * b1 + do * arr
                b0, b1 = n0, n1
            return b0, b1, fb

        @pl.when(run)
        def _():
            a_carry = (ab0_ref[0, :, :], abe_ref[0, :, :])
            if get_config().unroll:
                for _w in range(n_win):
                    a_carry = a0_window(_w, a_carry)
            else:
                jax.lax.fori_loop(0, n_win, a0_window, a_carry)
            carry = (b0_s[:], b1_s[:], e_s[:])
            if get_config().unroll:
                for _wr in range(n_win):
                    carry = bwd_window(_wr, carry)
            else:
                carry = jax.lax.fori_loop(0, n_win, bwd_window, carry)
            b0_s[:], b1_s[:], e_s[:] = carry

        @pl.when(jnp.logical_not(run))
        def _():
            pc_ref[:] = jnp.zeros_like(pc_ref)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            f0_ref[:] = b0_s[:]
            f1_ref[:] = b1_s[:]
            fe_ref[:] = e_s[:]

    return kernel


def _classic_bwd_call_half(
    blank, dcpt, nb, rep, sa, saf, ab0, abe, beta_init, ebi, lens, *,
    bb, bt, lm=None
):
    """Half-streamed backward: (pc combined acts, beta-final b0/b1/e)."""
    cfg = get_config()
    bpad, tpad, lpad2 = dcpt.shape
    lpad = lpad2 // (1 if cfg.fold_pt else 2)
    if lm is None:
        assert not cfg.fold_pt, "fold_pt requires the label-length mask"
        lm = jnp.ones((bpad, lpad), jnp.float32)
    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    big2 = pl.BlockSpec((bb, bt, 2 * lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    small = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, n_tb - 1 - j, 0))
    vec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
    svec = pl.BlockSpec((bb, 1), lambda i, j: (i, 0))
    bound = pl.BlockSpec((1, bb, lpad), lambda i, j: (n_tb - 1 - j, i, 0))
    kw = _k_win(bt)
    n_w = bt // kw
    frame = pl.BlockSpec((n_w, bb, lpad), lambda i, j: (n_tb - 1 - j, i, 0))
    dspec = big if cfg.fold_pt else big2

    return pl.pallas_call(
        _classic_bwd_kernel_half(bt, kw),
        grid=grid,
        in_specs=[vec, vec, vec, svec, svec, small, dspec, vec, vec, vec,
                  big, frame, bound, bound],
        out_specs=(big, vec, vec, vec),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, bt, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(beta_init[0], beta_init[1], beta_init[2], ebi, lens,
      blank, dcpt, nb, rep, lm, sa, saf, ab0, abe)


def _assemble_with_blank_identity(
    ctx: CtcContext, non_blank, fast_loss, batch, num_t, num_tokens
):
    """(combined, fast_loss) with the blank column from the posterior
    identity ``sum_v (-grad[b, t, v]) = 1`` (every valid frame emits exactly
    one token, so the per-frame emission posteriors sum to one).

    ``-grad[v] = exp(loss + combined[v])``; hence
    ``combined[blank] = log(1 - sum_{v != blank} exp(loss + non_blank[v]))
    - loss``.  Errors are absolute ~1e-7 (one subtraction from 1), well
    inside the library's 1e-5 gradient tolerance, and a clamp at 0 keeps the
    column exactly ``-inf`` (zero gradient) under fp rounding.
    """
    non_blank = non_blank[:batch, :num_t]
    loss_col = jnp.where(jnp.isfinite(fast_loss), fast_loss, 0.0)[:, None, None]
    token_is_blank = jnp.arange(num_tokens) == ctx.blank_index
    neg_grad = jnp.where(
        token_is_blank[None, None, :], 0.0, jnp.exp(loss_col + non_blank)
    )
    s = jnp.sum(neg_grad, axis=2, keepdims=True)
    bl = jnp.log(jnp.maximum(1.0 - s, 0.0)) - loss_col
    combined = jnp.where(token_is_blank[None, None, :], bl, non_blank)
    return combined, fast_loss


def _classic_streamed_acts(ctx: CtcContext, pack):
    """Streamed single-chunk combined acts plus their companions:
    ``(pc [bpad, tpad, lpad], fast_loss [batch], ebi [bpad, 1],
    probs [bpad, tpad, V], ohlm [bpad, lpad, V] bf16)``.

    Shared by the sums path (scatter einsum in XLA — _classic_grad_sums)
    and the fused-epilogue path (scatter + assembly + softmax VJP in one
    kernel — _classic_dlogits_impl)."""
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    bpad, tpad, lpad, bb, bt, _n_chunks, _chunk_t = _grad_geometry(
        batch, num_t, lp1
    )
    ck0, ck1, cke, loss = pack
    ebi = _ebi_from_loss(loss, bpad)
    beta0 = _beta_init(ctx, bpad, lpad)
    probs, blank, ohlm, ohp, nb, rep, lm, ohu = _classic_gather_level(
        ctx, bpad, tpad, lpad
    )
    dcpt = _classic_chunk_transitions(probs, ohlm, ohp, ohu)
    if get_config().half_stream:
        ab0, abe = cke
        pc, f0, _f1, fe = _classic_bwd_call_half(
            blank, dcpt, nb, rep, ck0, ck1, ab0, abe, beta0, ebi,
            _padded_lens(ctx, bpad), bb=bb, bt=bt, lm=lm
        )
    else:
        pc, f0, _f1, fe = _classic_bwd_call_streamed(
            blank, dcpt, nb, rep, ck0, ck1, beta0, ebi,
            _padded_lens(ctx, bpad), bb=bb, bt=bt, lm=lm
        )
    fast_loss = -(
        jnp.log(f0[:batch, 0]) + fe[:batch, 0].astype(jnp.float32) * LN2
    )
    return pc, fast_loss, ebi, probs, ohlm


def _classic_grad_sums(ctx: CtcContext, pack):
    """Shared kernel work of the gradient path: returns the token-scattered
    act sums [bpad, tpad, V], the kernel-derived loss and the act
    normaliser ``ebi``.

    ``pack = (cks0, cks1, ckse, loss)``: forward-pass checkpoints + loss.
    Streamed (_use_stream): per-step alpha residuals; single-chunk
    residual-free: per-block boundary carries [n_tb, bpad, lpad]; chunked:
    per-chunk initial carries [n_chunks, bpad, lpad] (the chunk scan
    regenerates block boundaries per chunk with one extra forward kernel).
    """
    batch, num_t, num_tokens = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    bpad, tpad, lpad, bb, bt, n_chunks, chunk_t = _grad_geometry(
        batch, num_t, lp1
    )

    if _use_stream(n_chunks):
        # single scatter: the combined act (see _classic_bwd_kernel_streamed)
        pc, fast_loss, ebi, _probs, ohlm = _classic_streamed_acts(ctx, pack)
        sums = jnp.einsum(
            "btl,blv->btv", pc, ohlm, precision=jax.lax.Precision.HIGH
        )
        return sums, fast_loss, ebi

    # streamed pack: (sa, saf, saf, loss); residual-free: (ck0/1/e, loss)
    ck0, ck1, cke, loss = pack
    ebi = _ebi_from_loss(loss, bpad)
    beta0 = _beta_init(ctx, bpad, lpad)
    probs, blank, ohlm, ohp, nb, rep, lm, ohu = _classic_gather_level(
        ctx, bpad, tpad, lpad
    )

    def scatter(ph, pd):
        # posteriors in [0, 1]: bf16x3 passes (HIGH) keep products to ~2^-21
        # relative with f32 accumulation -- inside the 1e-5 grad tolerance
        # at half the MXU passes of HIGHEST
        return jnp.einsum(
            "btl,blv->btv", ph, ohp, precision=jax.lax.Precision.HIGH
        ) + jnp.einsum(
            "btl,blv->btv", pd, ohlm, precision=jax.lax.Precision.HIGH
        )

    if n_chunks == 1:
        dcpt = _classic_chunk_transitions(probs, ohlm, ohp, ohu)
        ph, pd, f0, _f1, fe = _classic_bwd_call(
            blank, dcpt, nb, rep, ck0, ck1, cke, beta0, ebi, bb=bb, bt=bt,
            lm=lm
        )
        sums = scatter(ph, pd)
    else:
        num_v = probs.shape[2]

        def body(carry, c):
            cr = n_chunks - 1 - c
            t0 = cr * chunk_t
            probs_c = jax.lax.dynamic_slice(
                probs, (0, t0, 0), (bpad, chunk_t, num_v)
            )
            blank_c = jax.lax.dynamic_slice(
                blank, (0, t0, 0), (bpad, chunk_t, 1)
            )
            dcpt = _classic_chunk_transitions(probs_c, ohlm, ohp, ohu)
            b0c, b1c, bec, _, _, _ = _classic_fwd_call(
                blank_c, dcpt, nb, rep, lm=lm, mode="bound",
                init=(ck0[cr], ck1[cr], cke[cr]), bb=bb, bt=bt,
            )
            ph, pd, fb0, fb1, fbe = _classic_bwd_call(
                blank_c, dcpt, nb, rep, b0c, b1c, bec, carry, ebi,
                bb=bb, bt=bt, lm=lm,
            )
            return (fb0, fb1, fbe), scatter(ph, pd)

        (f0, _f1, fe), sums_rev = jax.lax.scan(
            body, beta0, jnp.arange(n_chunks)
        )
        # chunks were processed last-to-first; restore time order
        sums = jnp.moveaxis(jnp.flip(sums_rev, axis=0), 0, 1).reshape(
            bpad, tpad, num_v
        )

    fast_loss = -(
        jnp.log(f0[:batch, 0]) + fe[:batch, 0].astype(jnp.float32) * LN2
    )
    return sums, fast_loss, ebi


def _maybe_sort_for_grad(ctx: CtcContext):
    """(ctx, inverse permutation, forward permutation) — permutations are
    None when sorting is off.  ``perm`` lets callers gather per-sample
    companions (e.g. the loss cotangent) into the sorted order."""
    batch, num_t, _ = ctx.logproba.shape
    n_chunks = _grad_geometry(batch, num_t, ctx.label.shape[1])[5]
    if _use_stream(n_chunks) and _sort_active(ctx):
        sorted_ctx, inv = _sort_ctx(ctx)
        return sorted_ctx, inv, jnp.argsort(inv, stable=True)
    return ctx, None, None


@_cfg_jit
def _classic_grad_impl(ctx: CtcContext, pack):
    """(combined [B, T, V] log-space, fast_loss [B]) via the fused kernels
    (the log-form surface kept for ``gradient_log`` parity consumers)."""
    batch, num_t, num_tokens = ctx.logproba.shape
    ctx, inv, _perm = _maybe_sort_for_grad(ctx)
    sums, fast_loss, ebi = _classic_grad_sums(ctx, pack)
    non_blank = ebi[:batch, :, None] * LN2 + jnp.log(sums[:batch, :num_t])
    combined, fast_loss = _assemble_with_blank_identity(
        ctx, non_blank, fast_loss, batch, num_t, num_tokens
    )
    if inv is not None:
        combined = jnp.take(combined, inv, axis=0)
        fast_loss = jnp.take(fast_loss, inv)
    return combined, fast_loss


def _grad_direct_assemble(ctx, sums, loss_for_mask, ebi,
                          batch, num_t, num_tokens):
    """Probability-space gradient assembly — no log/exp passes over [B,T,V].

    ``-grad = exp(loss + ebi*ln2) * sums`` for non-blank tokens: the acts
    were kernel-normalised by ``2^-ebi`` with ``ebi = floor(-loss/ln2)``, so
    the residual scale ``exp(loss + ebi*ln2)`` is a per-sample scalar in
    (0.5, 1].  Blank column from the posterior identity ``sum_v -grad = 1``
    (same argument as _assemble_with_blank_identity); infeasible samples and
    steps past logit_length are exactly zero.
    """
    safe = jnp.where(jnp.isfinite(loss_for_mask), loss_for_mask, 0.0)
    scale = jnp.exp(safe + ebi[:batch, 0] * LN2)
    neg_nb = scale[:, None, None] * sums[:batch, :num_t]
    token_is_blank = jnp.arange(num_tokens) == ctx.blank_index
    s = jnp.sum(
        jnp.where(token_is_blank[None, None, :], 0.0, neg_nb),
        axis=2, keepdims=True,
    )
    neg = jnp.where(
        token_is_blank[None, None, :], jnp.maximum(1.0 - s, 0.0), neg_nb
    )
    grad = -neg
    grad = jnp.where(
        jnp.isposinf(loss_for_mask)[:, None, None], 0.0, grad
    )
    return jnp.where(ctx.logit_length_mask[:, :, None], grad, 0.0)


@_cfg_jit
def _classic_grad_direct_impl(ctx: CtcContext, pack):
    """(grad [B, T, V], fast_loss [B]) — the hot-path form: one per-sample
    scalar multiply instead of the log->add->exp chain over [B, T, V]."""
    batch, num_t, num_tokens = ctx.logproba.shape
    ctx, inv, _perm = _maybe_sort_for_grad(ctx)
    sums, fast_loss, ebi = _classic_grad_sums(ctx, pack)
    grad = _grad_direct_assemble(
        ctx, sums, fast_loss, ebi, batch, num_t, num_tokens
    )
    if inv is not None:
        grad = jnp.take(grad, inv, axis=0)
        fast_loss = jnp.take(fast_loss, inv)
    return grad, fast_loss


def classic_gradient_with_loss(ctx: CtcContext, loss=None, pack=None):
    """Fused-kernel probability-space gradient (hot path).

    Semantics identical to ``-exp(classic_gradient_log_with_loss(...))``
    without the elementwise log/exp round-trip over [B, T, V].
    """
    batch, num_t, num_tokens = ctx.logproba.shape
    if batch == 0 or num_t == 0:
        zeros = jnp.zeros((batch, num_t, num_tokens), jnp.float32)
        if loss is None:
            loss = classic_mod.loss(ctx, classic_mod.alpha(ctx))
        return zeros, loss
    if pack is None:
        _, pack = _classic_loss_and_pack_impl(ctx)
    grad, fast_loss = _classic_grad_direct_impl(ctx, pack)
    return grad, fast_loss


def classic_gradient_log_with_loss(ctx: CtcContext, loss=None, pack=None):
    """Fused-kernel ``core.gradient_log`` for the classic topology.

    Returns ``(log(-grad), fast_loss)``; semantics identical to the pure
    path (base_loss.py:270-298).  ``fast_loss`` is always the kernel-derived
    loss (from beta[0]) — it doubles as the flush detector for the
    saturation guard in ops/topology.py.  When ``pack`` is None (standalone
    gradient call) the forward bound-mode kernel runs first to produce the
    boundary carries and the normaliser loss.
    """
    from tf_seq2seq_losses_tpu.utils.numerics import apply_logarithmic_mask

    batch, num_t, num_tokens = ctx.logproba.shape
    if batch == 0 or num_t == 0:
        empty = jnp.full((batch, num_t, num_tokens), NEG_INF, jnp.float32)
        if loss is None:
            loss = classic_mod.loss(ctx, classic_mod.alpha(ctx))
        return empty, loss

    if pack is None:
        _, pack = _classic_loss_and_pack_impl(ctx)
    combined, fast_loss = _classic_grad_impl(ctx, pack)
    if loss is None:
        loss = fast_loss
    out = loss[:, None, None] + combined
    out = jnp.where(jnp.isposinf(loss)[:, None, None], NEG_INF, out)
    out = apply_logarithmic_mask(out, ctx.logit_length_mask[:, :, None])
    return out, fast_loss


def classic_gradient_log(ctx: CtcContext, loss=None) -> Array:
    return classic_gradient_log_with_loss(ctx, loss)[0]


# ---------------------------------------------------------------------------
# simplified topology kernels
# ---------------------------------------------------------------------------


def _simplified_win_step(a, blank, dg, s_arr):
    """One windowed forward step on the single-state carry
    (simplified_ctc_loss.py:358-438): pure f32."""
    arr = pltpu.roll(a * dg, shift=1, axis=1) * s_arr
    return a * blank + arr


def _simplified_fwd_kernel(mode: str, block_t: int, k_win: int):
    """Windowed block-float single-state alpha scan
    (simplified_ctc_loss.py:358-438)."""
    n_win = block_t // k_win

    def kernel(i0_ref, ie_ref, lens_ref, blank_ref, dg_ref, *rest):
        sa_ref = saf_ref = None
        if mode == "bound":
            b_ref, be_ref, f_ref, fe_ref, a_s, e_s = rest
        elif mode == "resid":
            sa_ref, saf_ref, f_ref, fe_ref, a_s, e_s = rest
        else:
            f_ref, fe_ref, a_s, e_s = rest
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            a_s[:] = i0_ref[:]
            e_s[:] = ie_ref[:]

        if mode == "bound":
            b_ref[0, :, :] = a_s[:]
            be_ref[0, :, :] = e_s[:]

        # whole-cell skip past the block max length (see _classic_fwd_kernel)
        run = jnp.max(lens_ref[:]) >= j * block_t
        if mode == "resid":
            # force the top block for the streamed bwd's forced read (see
            # _classic_fwd_kernel)
            run = jnp.logical_or(run, j == pl.num_programs(1) - 1)

        def window(w, carry):
            a, e = carry
            (a,), f, s_arr = _open_window([a], e, k_win, True)
            if mode == "resid":
                saf_ref[w, :, :] = f
            for kk in range(k_win):
                k = w * k_win + kk
                if mode == "resid":
                    sa_ref[:, k, :] = a
                a = _simplified_win_step(
                    a, blank_ref[:, k, :], dg_ref[:, k, :], s_arr
                )
            return a, f

        def run_block():
            carry = (a_s[:], e_s[:])
            if get_config().unroll:
                for _w in range(n_win):
                    carry = window(_w, carry)
            else:
                carry = jax.lax.fori_loop(0, n_win, window, carry)
            a_s[:], e_s[:] = carry

        if mode == "bound":
            run_block()
        else:
            pl.when(run)(run_block)

        if mode == "final":
            f_ref[:] = a_s[:]
            fe_ref[:] = e_s[:]
        else:

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                f_ref[:] = a_s[:]
                fe_ref[:] = e_s[:]

    return kernel


def _simplified_fwd_call(blank, dg, *, mode, bb, bt, init=None, lens=None):
    cfg = get_config()
    bpad, tpad, lpad = dg.shape
    if init is None:
        a0, _, e0 = _alpha_init(bpad, lpad)
        init = (a0, e0)
    if lens is None:
        lens = jnp.full((bpad, 1), tpad, jnp.int32)
    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, j, 0))
    small = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, j, 0))
    vec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
    svec = pl.BlockSpec((bb, 1), lambda i, j: (i, 0))
    bound = pl.BlockSpec((1, bb, lpad), lambda i, j: (j, i, 0))

    if mode == "bound":
        out_shape = (
            jax.ShapeDtypeStruct((n_tb, bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((n_tb, bpad, lpad), jnp.int32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        )
        out_specs = (bound, bound, vec, vec)
    elif mode == "resid":
        kw = _k_win(bt)
        n_w = bt // kw
        frame = pl.BlockSpec((n_w, bb, lpad), lambda i, j: (j, i, 0))
        out_shape = (
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((n_tb * n_w, bpad, lpad), jnp.int32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        )
        out_specs = (big, frame, vec, vec)
    else:
        out_shape = (
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        )
        out_specs = (vec, vec)

    return pl.pallas_call(
        _simplified_fwd_kernel(mode, bt, _k_win(bt)),
        grid=grid,
        in_specs=[vec, vec, svec, small, big],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Mosaic's default 16 MB scoped-vmem cap rejects the backward
            # kernel at lane widths >= 512 (17.2 MB measured at B=256,
            # T=1000); the chip has far more physical VMEM, so raise it.
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(init[0], init[1], lens, blank, dg)


def _pick_loss_single(fin, fe, ctx, batch, lp1):
    picked = jnp.take_along_axis(
        fin[:batch, :lp1], ctx.label_length[:, None], axis=1
    )[:, 0]
    picked_e = jnp.take_along_axis(
        fe[:batch, :lp1], ctx.label_length[:, None], axis=1
    )[:, 0]
    return -(jnp.log(picked) + picked_e.astype(jnp.float32) * LN2)


def _simplified_fwd_scan(ctx, bpad, tpad, lpad, bb, bt, n_chunks, chunk_t,
                         emit_checkpoints):
    """Forward pass as a chunk scan (see _classic_fwd_scan)."""
    probs, blank, ohlm = _simplified_gather_level(ctx, bpad, tpad, lpad)
    if n_chunks == 1:
        dg = _simplified_chunk_transitions(probs, ohlm)
        if emit_checkpoints:
            b, be, fin, fe = _simplified_fwd_call(
                blank, dg, mode="bound", bb=bb, bt=bt
            )
            return (fin, fe), (b, be)
        return _simplified_fwd_call(
            blank, dg, mode="final", bb=bb, bt=bt
        ), None

    num_v = probs.shape[2]

    def body(carry, c):
        t0 = c * chunk_t
        probs_c = jax.lax.dynamic_slice(
            probs, (0, t0, 0), (bpad, chunk_t, num_v)
        )
        blank_c = jax.lax.dynamic_slice(blank, (0, t0, 0), (bpad, chunk_t, 1))
        dg = _simplified_chunk_transitions(probs_c, ohlm)
        fin = _simplified_fwd_call(
            blank_c, dg, mode="final", init=carry, bb=bb, bt=bt
        )
        return fin, (carry if emit_checkpoints else None)

    a0, _, e0 = _alpha_init(bpad, lpad)
    final, cks = jax.lax.scan(body, (a0, e0), jnp.arange(n_chunks))
    return final, cks


@_cfg_jit
def _simplified_loss_fast_impl(ctx: CtcContext):
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    lpad = _round_up(lp1, 128)
    bb, bt = _fit_blocks(lpad, num_big_buffers=3, num_t=num_t, batch=batch)
    bpad = _round_up(batch, bb)
    n_chunks, chunk_t, tpad = _chunk_plan(num_t, bt)
    (fin, fe), _ = _simplified_fwd_scan(
        ctx, bpad, tpad, lpad, bb, bt, n_chunks, chunk_t, False
    )
    return _pick_loss_single(fin, fe, ctx, batch, lp1)


def simplified_loss_fast(ctx: CtcContext) -> Array:
    """Forward-only simplified loss (simplified_ctc_loss.py:73-83)."""
    from tf_seq2seq_losses_tpu.ops import simplified as s

    batch, num_t, _ = ctx.logproba.shape
    if num_t == 0 or batch == 0:
        return s.loss(ctx, s.alpha(ctx))
    return _simplified_loss_fast_impl(ctx)


@_cfg_jit
def _simplified_loss_and_pack_impl(ctx: CtcContext):
    """Loss via the bound-mode kernel plus the boundary-carry pack
    (see classic_loss_and_pack)."""
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    bpad, tpad, lpad, bb, bt, n_chunks, chunk_t = _grad_geometry(
        batch, num_t, lp1
    )
    if _use_stream(n_chunks):
        inv = None
        if _sort_active(ctx):
            ctx, inv = _sort_ctx(ctx)
        probs, blank, ohlm = _simplified_gather_level(ctx, bpad, tpad, lpad)
        dg = _simplified_chunk_transitions(probs, ohlm)
        sa, saf, fin, fe = _simplified_fwd_call(
            blank, dg, mode="resid", bb=bb, bt=bt,
            lens=_padded_lens(ctx, bpad),
        )
        loss_s = _pick_loss_single(fin, fe, ctx, batch, lp1)
        loss = loss_s if inv is None else jnp.take(loss_s, inv)
        return loss, (sa, saf, loss_s)
    (fin, fe), cks = _simplified_fwd_scan(
        ctx, bpad, tpad, lpad, bb, bt, n_chunks, chunk_t, True
    )
    loss = _pick_loss_single(fin, fe, ctx, batch, lp1)
    return loss, (cks[0], cks[1], loss)


def simplified_loss_and_pack(ctx: CtcContext):
    from tf_seq2seq_losses_tpu.ops import simplified as s

    batch, num_t, _ = ctx.logproba.shape
    if num_t == 0 or batch == 0:
        return s.loss(ctx, s.alpha(ctx)), None
    return _simplified_loss_and_pack_impl(ctx)


def _simplified_bwd_call(blank, dg, bnd, bnde, beta_init, ebi, *, bb, bt):
    """beta_init: (b, e) [bpad, lpad] carry at the end of this span.
    Returns (pd, beta-final b/e)."""
    cfg = get_config()
    bpad, tpad, lpad = dg.shape
    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    small = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, n_tb - 1 - j, 0))
    vec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
    svec = pl.BlockSpec((bb, 1), lambda i, j: (i, 0))
    bound = pl.BlockSpec((1, bb, lpad), lambda i, j: (n_tb - 1 - j, i, 0))

    kw = _k_win(bt)
    n_win = bt // kw

    def kernel(
        bi_ref, bie_ref, ebi_ref, blank_ref, dg_ref, bb_ref, bbe_ref,
        pd_ref, fin_ref, fe_ref,
        sa, saf, b_s, e_s,
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b_s[:] = bi_ref[:]
            e_s[:] = bie_ref[:]

        # phase 1: re-expand alpha across the block (windowed, identical
        # ops to the forward kernel)
        def fwd_window(w, carry):
            a, e = carry
            (a,), f, s_arr = _open_window([a], e, kw, True)
            saf[:, w, :] = f
            for kk in range(kw):
                k = w * kw + kk
                sa[:, k, :] = a
                a = _simplified_win_step(
                    a, blank_ref[:, k, :], dg_ref[:, k, :], s_arr
                )
            return a, f

        carry = (bb_ref[0, :, :], bbe_ref[0, :, :])
        if get_config().unroll:
            for _w in range(n_win):
                carry = fwd_window(_w, carry)
        else:
            jax.lax.fori_loop(0, n_win, fwd_window, carry)

        # phase 2: beta windows backwards (simplified_ctc_loss.py:291-343)
        ebi = ebi_ref[:]
        lpad_ = b_s.shape[1]

        def bwd_window(wr, carry):
            w = n_win - 1 - wr
            b, eb = carry
            (b,), fb, s_arr = _open_window([b], eb, kw, False)
            s_hi, s_lo = _act_factor(saf[:, w, :], fb, ebi)
            for kk in range(kw - 1, -1, -1):
                k = w * kw + kk
                blank = blank_ref[:, k, :]
                dg = dg_ref[:, k, :]
                a = sa[:, k, :]

                arr = pltpu.roll(b, shift=lpad_ - 1, axis=1) * s_arr
                # normalised posterior act (simplified_ctc_loss.py:456-534);
                # blank column recovered in XLA from the posterior identity
                pd_ref[:, k, :] = (a * dg) * arr * s_hi * s_lo
                b = blank * b + dg * arr
            return b, fb

        carry = (b_s[:], e_s[:])
        if get_config().unroll:
            for _wr in range(n_win):
                carry = bwd_window(_wr, carry)
        else:
            carry = jax.lax.fori_loop(0, n_win, bwd_window, carry)
        b_s[:], e_s[:] = carry

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            fin_ref[:] = b_s[:]
            fe_ref[:] = e_s[:]

    big3 = jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec, vec, svec, small, big, bound, bound],
        out_specs=(big, vec, vec),
        out_shape=(
            big3,
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, bt, lpad), jnp.float32),
            pltpu.VMEM((bb, bt // kw, lpad), jnp.int32),
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Mosaic's default 16 MB scoped-vmem cap rejects the backward
            # kernel at lane widths >= 512 (17.2 MB measured at B=256,
            # T=1000); the chip has far more physical VMEM, so raise it.
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(beta_init[0], beta_init[1], ebi, blank, dg, bnd, bnde)


def _simplified_bwd_call_streamed(blank, dg, sa, saf, beta_init, ebi, lens,
                                  *, bb, bt):
    """Streamed-residual simplified backward: beta-only scan reading the
    forward kernel's per-step alpha mantissas + per-window frames.
    Returns (pd acts, beta-final b/e)."""
    cfg = get_config()
    bpad, tpad, lpad = dg.shape
    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    small = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, n_tb - 1 - j, 0))
    vec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
    svec = pl.BlockSpec((bb, 1), lambda i, j: (i, 0))
    kw = _k_win(bt)
    n_w = bt // kw
    frame = pl.BlockSpec((n_w, bb, lpad), lambda i, j: (n_tb - 1 - j, i, 0))
    n_win = n_w

    def kernel(
        bi_ref, bie_ref, ebi_ref, lens_ref, blank_ref, dg_ref, sa_ref,
        saf_ref,
        pd_ref, fin_ref, fe_ref,
        b_s, e_s,
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b_s[:] = bi_ref[:]
            e_s[:] = bie_ref[:]

        tb = pl.num_programs(1) - 1 - j
        run = jnp.logical_or(
            tb * bt < jnp.max(lens_ref[:]), j == 0
        )

        ebi = ebi_ref[:]
        lpad_ = b_s.shape[1]

        def bwd_window(wr, carry):
            w = n_win - 1 - wr
            b, eb = carry
            (b,), fb, s_arr = _open_window([b], eb, kw, False)
            s_hi, s_lo = _act_factor(saf_ref[w, :, :], fb, ebi)
            for kk in range(kw - 1, -1, -1):
                k = w * kw + kk
                blank = blank_ref[:, k, :]
                dg = dg_ref[:, k, :]
                a = sa_ref[:, k, :]
                arr = pltpu.roll(b, shift=lpad_ - 1, axis=1) * s_arr
                pd_ref[:, k, :] = (a * dg) * arr * s_hi * s_lo
                b = blank * b + dg * arr
            return b, fb

        @pl.when(run)
        def _():
            carry = (b_s[:], e_s[:])
            if get_config().unroll:
                for _wr in range(n_win):
                    carry = bwd_window(_wr, carry)
            else:
                carry = jax.lax.fori_loop(0, n_win, bwd_window, carry)
            b_s[:], e_s[:] = carry

        @pl.when(jnp.logical_not(run))
        def _():
            pd_ref[:] = jnp.zeros_like(pd_ref)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            fin_ref[:] = b_s[:]
            fe_ref[:] = e_s[:]

    big3 = jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec, vec, svec, svec, small, big, big, frame],
        out_specs=(big, vec, vec),
        out_shape=(
            big3,
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(beta_init[0], beta_init[1], ebi, lens, blank, dg, sa, saf)


def _simplified_streamed_acts(ctx: CtcContext, pack):
    """Streamed single-chunk acts for the simplified topology; see
    _classic_streamed_acts."""
    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    bpad, tpad, lpad, bb, bt, _n_chunks, _chunk_t = _grad_geometry(
        batch, num_t, lp1
    )
    ck, cke, loss = pack
    b_hot, _, be0 = _beta_init(ctx, bpad, lpad)
    ebi = _ebi_from_loss(loss, bpad)
    probs, blank, ohlm = _simplified_gather_level(ctx, bpad, tpad, lpad)
    dg = _simplified_chunk_transitions(probs, ohlm)
    pd, fin, fe = _simplified_bwd_call_streamed(
        blank, dg, ck, cke, (b_hot, be0), ebi, _padded_lens(ctx, bpad),
        bb=bb, bt=bt
    )
    fast_loss = -(
        jnp.log(fin[:batch, 0]) + fe[:batch, 0].astype(jnp.float32) * LN2
    )
    return pd, fast_loss, ebi, probs, ohlm


def _simplified_grad_sums(ctx: CtcContext, pack):
    batch, num_t, num_tokens = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    bpad, tpad, lpad, bb, bt, n_chunks, chunk_t = _grad_geometry(
        batch, num_t, lp1
    )

    if _use_stream(n_chunks):
        pd, fast_loss, ebi, _probs, ohlm = _simplified_streamed_acts(
            ctx, pack
        )
        sums = jnp.einsum(
            "btl,blv->btv", pd, ohlm, precision=jax.lax.Precision.HIGH
        )
        return sums, fast_loss, ebi

    # streamed pack: (sa, saf, loss); residual-free: (ck, cke, loss)
    ck, cke, loss = pack
    b_hot, _, be0 = _beta_init(ctx, bpad, lpad)
    ebi = _ebi_from_loss(loss, bpad)
    probs, blank, ohlm = _simplified_gather_level(ctx, bpad, tpad, lpad)

    def scatter(pd):
        return jnp.einsum(
            "btl,blv->btv", pd, ohlm, precision=jax.lax.Precision.HIGH
        )

    if n_chunks == 1:
        dg = _simplified_chunk_transitions(probs, ohlm)
        pd, fin, fe = _simplified_bwd_call(
            blank, dg, ck, cke, (b_hot, be0), ebi, bb=bb, bt=bt
        )
        sums = scatter(pd)
    else:
        num_v = probs.shape[2]

        def body(carry, c):
            cr = n_chunks - 1 - c
            t0 = cr * chunk_t
            probs_c = jax.lax.dynamic_slice(
                probs, (0, t0, 0), (bpad, chunk_t, num_v)
            )
            blank_c = jax.lax.dynamic_slice(
                blank, (0, t0, 0), (bpad, chunk_t, 1)
            )
            dg = _simplified_chunk_transitions(probs_c, ohlm)
            bc, bec, _, _ = _simplified_fwd_call(
                blank_c, dg, mode="bound", init=(ck[cr], cke[cr]), bb=bb, bt=bt
            )
            pd, fb, fbe = _simplified_bwd_call(
                blank_c, dg, bc, bec, carry, ebi, bb=bb, bt=bt
            )
            return (fb, fbe), scatter(pd)

        (fin, fe), sums_rev = jax.lax.scan(
            body, (b_hot, be0), jnp.arange(n_chunks)
        )
        sums = jnp.moveaxis(jnp.flip(sums_rev, axis=0), 0, 1).reshape(
            bpad, tpad, num_v
        )

    fast_loss = -(
        jnp.log(fin[:batch, 0]) + fe[:batch, 0].astype(jnp.float32) * LN2
    )
    return sums, fast_loss, ebi


@_cfg_jit
def _simplified_grad_impl(ctx: CtcContext, pack):
    batch, num_t, num_tokens = ctx.logproba.shape
    ctx, inv, _perm = _maybe_sort_for_grad(ctx)
    sums, fast_loss, ebi = _simplified_grad_sums(ctx, pack)
    non_blank = ebi[:batch, :, None] * LN2 + jnp.log(sums[:batch, :num_t])
    combined, fast_loss = _assemble_with_blank_identity(
        ctx, non_blank, fast_loss, batch, num_t, num_tokens
    )
    if inv is not None:
        combined = jnp.take(combined, inv, axis=0)
        fast_loss = jnp.take(fast_loss, inv)
    return combined, fast_loss


@_cfg_jit
def _simplified_grad_direct_impl(ctx: CtcContext, pack):
    batch, num_t, num_tokens = ctx.logproba.shape
    ctx, inv, _perm = _maybe_sort_for_grad(ctx)
    sums, fast_loss, ebi = _simplified_grad_sums(ctx, pack)
    grad = _grad_direct_assemble(
        ctx, sums, fast_loss, ebi, batch, num_t, num_tokens
    )
    if inv is not None:
        grad = jnp.take(grad, inv, axis=0)
        fast_loss = jnp.take(fast_loss, inv)
    return grad, fast_loss


def simplified_gradient_with_loss(ctx: CtcContext, loss=None, pack=None):
    """Fused-kernel probability-space gradient (hot path); see
    classic_gradient_with_loss."""
    from tf_seq2seq_losses_tpu.ops import simplified as s

    batch, num_t, num_tokens = ctx.logproba.shape
    if batch == 0 or num_t == 0:
        zeros = jnp.zeros((batch, num_t, num_tokens), jnp.float32)
        if loss is None:
            loss = s.loss(ctx, s.alpha(ctx))
        return zeros, loss
    if pack is None:
        _, pack = _simplified_loss_and_pack_impl(ctx)
    grad, fast_loss = _simplified_grad_direct_impl(ctx, pack)
    return grad, fast_loss


def simplified_gradient_log_with_loss(ctx: CtcContext, loss=None, pack=None):
    """Fused-kernel ``core.gradient_log`` for the simplified topology."""
    from tf_seq2seq_losses_tpu.ops import simplified as s
    from tf_seq2seq_losses_tpu.utils.numerics import apply_logarithmic_mask

    batch, num_t, num_tokens = ctx.logproba.shape
    if batch == 0 or num_t == 0:
        empty = jnp.full((batch, num_t, num_tokens), NEG_INF, jnp.float32)
        if loss is None:
            loss = s.loss(ctx, s.alpha(ctx))
        return empty, loss

    if pack is None:
        _, pack = _simplified_loss_and_pack_impl(ctx)
    combined, fast_loss = _simplified_grad_impl(ctx, pack)
    if loss is None:
        loss = fast_loss
    out = loss[:, None, None] + combined
    out = jnp.where(jnp.isposinf(loss)[:, None, None], NEG_INF, out)
    out = apply_logarithmic_mask(out, ctx.logit_length_mask[:, :, None])
    return out, fast_loss


def simplified_gradient_log(ctx: CtcContext, loss=None) -> Array:
    return simplified_gradient_log_with_loss(ctx, loss)[0]


# ---------------------------------------------------------------------------
# fused d_logits epilogue
# ---------------------------------------------------------------------------
#
# On the streamed single-chunk geometry the gradient epilogue is three
# HBM-bound XLA stages: the act-scatter einsum (write ``sums`` [B, T, V]),
# the probability-space assembly (read sums, write ``grad``), and the
# log-softmax VJP in autodiff.llf_bwd (read grad + read logproba, write
# d_logits).  This kernel fuses all three: per (sample, time-block) grid
# cell it runs the scatter matmul on the MXU and emits ``d_logits``
# directly, so ``sums`` and ``grad`` never round-trip HBM (the V-cost that
# kept the ASR V=128 config behind the V=32 ratio — NOTES.md round-4 #2).
#
# The scatter is per-sample (each sample has its own one-hot), which is
# exactly the Mosaic batch-dim ``dot_general`` dead end measured in
# benchmarks/diag_batched_dot.py (500x).  The different formulation that
# works: batch rides the GRID (one sample per cell), so each cell's
# contraction is a plain 2D [bt, L] @ [L, V] MXU matmul.  It runs as two
# bf16 passes on an exact hi/lo split of the f32 acts: one-hot operands are
# exact in bf16, so the only error is the split residual (~2^-17 relative)
# — tighter than the unfused einsum's bf16x3 HIGH (and one less pass).
#
# Applicability (``fused_epilogue_ok``): streamed single-chunk geometry and
# a lane-aligned vocabulary (num_tokens % 128 == 0).  An unaligned V would
# force [B, T, Vpad] padding copies of ``probs`` that cost more than the
# fusion saves at small V; those geometries keep the unfused path.


def fused_epilogue_ok(
    batch: int, num_t: int, num_tokens: int, lp1: int
) -> bool:
    """Static gate for the fused d_logits epilogue (see module comment)."""
    cfg = get_config()
    if not cfg.fused_epilogue:
        return False
    if batch == 0 or num_t == 0:
        return False
    if num_tokens % 128 != 0:
        return False
    n_chunks = _grad_geometry(batch, num_t, lp1)[5]
    return _use_stream(n_chunks)


def _fused_block_t(tpad: int, lpad: int, vpad: int) -> int:
    """Largest time-block (dividing tpad, sublane-aligned) whose working set
    (pc + probs + out blocks, double-buffered, plus the one-hot) fits a
    fixed 6 MB slice of VMEM; typically the whole padded time axis."""
    budget = 6 << 20
    bt = tpad

    def est(bt_):
        return bt_ * (lpad + 2 * vpad) * 4 * 2 + lpad * vpad * 2 * 2

    while est(bt) > budget and bt % 2 == 0 and (bt // 2) % 8 == 0:
        bt //= 2
    return bt


def _fused_epilogue_kernel(bt_e: int):
    def kernel(sc_ref, dl_ref, len_ref, bl_ref, oh_ref, pc_ref, p_ref,
               out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        pc2 = pc_ref[0]  # [bt_e, lpad] f32 combined acts
        hi = pc2.astype(jnp.bfloat16)
        lo = (pc2 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh = oh_ref[0]  # [lpad, vpad] bf16 0/1
        dn = (((1,), (0,)), ((), ()))
        sums = jax.lax.dot_general(
            hi, oh, dn, preferred_element_type=jnp.float32
        )
        sums = sums + jax.lax.dot_general(
            lo, oh, dn, preferred_element_type=jnp.float32
        )
        # per-sample scalars ride SMEM (a (1, 1) VMEM block would violate
        # Mosaic's sublane-divisibility rule on the (bpad, 1) arrays)
        sc = sc_ref[i]  # exp(loss + ebi*ln2): act scale residual
        dl = dl_ref[i]  # d_loss, zeroed for non-finite-loss rows
        ln = len_ref[i]  # logit_length, zeroed for non-finite rows
        isbl = bl_ref[:] > 0.5  # [1, vpad] blank-lane mask
        neg_nb = sc * sums  # -grad, non-blank lanes
        s = jnp.sum(jnp.where(isbl, 0.0, neg_nb), axis=1, keepdims=True)
        # blank lane from the posterior identity sum_v(-grad) = 1 (see
        # _assemble_with_blank_identity); clamp keeps it >= 0 under rounding
        neg = jnp.where(isbl, jnp.maximum(1.0 - s, 0.0), neg_nb)
        # d_logits = d_loss * (grad + softmax * valid)  (autodiff.llf_bwd);
        # the where-select (not a multiply) also discards garbage act rows
        # of padded/infeasible/flushed samples without 0 * inf hazards
        t_iota = jax.lax.broadcasted_iota(jnp.int32, sums.shape, 0)
        valid = (t_iota + j * bt_e) < ln
        out_ref[0] = jnp.where(valid, dl * (p_ref[0] - neg), 0.0)

    return kernel


def _fused_epilogue_call(pc, oh, probs, sc, dlf, lens, isbl, *, bt_e):
    cfg = get_config()
    bpad, tpad, lpad = pc.shape
    vpad = probs.shape[2]
    grid = (bpad, tpad // bt_e)
    return pl.pallas_call(
        _fused_epilogue_kernel(bt_e),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, vpad), lambda i, j: (0, 0)),
            pl.BlockSpec((1, lpad, vpad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bt_e, lpad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bt_e, vpad), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt_e, vpad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bpad, tpad, vpad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=cfg.vmem_limit_mb << 20,
        ),
        interpret=cfg.interpret,
    )(sc, dlf, lens, isbl, oh, pc, probs)


def _fused_dlogits(ctx, pc, probs, oh, fast_loss, ebi, d_loss):
    """d_logits [bpad, tpad, V] from the streamed acts in one kernel.

    Semantically identical (to ~2^-17 relative) to
    ``d_loss * (gradient_fast + softmax * valid_mask)`` — the composition of
    _grad_direct_assemble with autodiff.llf_bwd's analytic log-softmax
    cotangent."""
    batch = ctx.logproba.shape[0]
    num_tokens = ctx.logproba.shape[2]
    bpad, tpad, lpad = pc.shape
    fin = jnp.isfinite(fast_loss)
    safe = jnp.where(fin, fast_loss, 0.0)
    sc = jnp.exp(safe + ebi[:batch, 0] * LN2)
    dlf = jnp.where(fin, d_loss.astype(jnp.float32), 0.0)
    lens = jnp.where(fin, ctx.logit_length.astype(jnp.int32), 0)
    pad = (0, bpad - batch)
    sc = jnp.pad(sc, pad)
    dlf = jnp.pad(dlf, pad)
    lens = jnp.pad(lens, pad)
    isbl = (
        jnp.arange(num_tokens) == ctx.blank_index
    ).astype(jnp.float32)[None, :]
    bt_e = _fused_block_t(tpad, lpad, num_tokens)
    return _fused_epilogue_call(pc, oh, probs, sc, dlf, lens, isbl, bt_e=bt_e)


@_cfg_jit
def _classic_dlogits_impl(ctx: CtcContext, pack, d_loss):
    batch, num_t, num_tokens = ctx.logproba.shape
    ctx, inv, perm = _maybe_sort_for_grad(ctx)
    if perm is not None:
        d_loss = jnp.take(d_loss, perm, axis=0)
    pc, fast_loss, ebi, probs, oh = _classic_streamed_acts(ctx, pack)
    out = _fused_dlogits(ctx, pc, probs, oh, fast_loss, ebi, d_loss)
    out = out[:batch, :num_t, :num_tokens]
    if inv is not None:
        out = jnp.take(out, inv, axis=0)
        fast_loss = jnp.take(fast_loss, inv)
    return out, fast_loss


def classic_dlogits_with_loss(ctx: CtcContext, d_loss, pack=None):
    """(d_logits [B, T, V], fast_loss [B]) via the fused epilogue kernel.

    Callers must check :func:`fused_epilogue_ok` first (the streamed
    single-chunk pack layout is assumed)."""
    if pack is None:
        _, pack = _classic_loss_and_pack_impl(ctx)
    return _classic_dlogits_impl(ctx, pack, d_loss)


@_cfg_jit
def _simplified_dlogits_impl(ctx: CtcContext, pack, d_loss):
    batch, num_t, num_tokens = ctx.logproba.shape
    ctx, inv, perm = _maybe_sort_for_grad(ctx)
    if perm is not None:
        d_loss = jnp.take(d_loss, perm, axis=0)
    pd, fast_loss, ebi, probs, oh = _simplified_streamed_acts(ctx, pack)
    out = _fused_dlogits(ctx, pd, probs, oh, fast_loss, ebi, d_loss)
    out = out[:batch, :num_t, :num_tokens]
    if inv is not None:
        out = jnp.take(out, inv, axis=0)
        fast_loss = jnp.take(fast_loss, inv)
    return out, fast_loss


def simplified_dlogits_with_loss(ctx: CtcContext, d_loss, pack=None):
    """See classic_dlogits_with_loss."""
    if pack is None:
        _, pack = _simplified_loss_and_pack_impl(ctx)
    return _simplified_dlogits_impl(ctx, pack, d_loss)
