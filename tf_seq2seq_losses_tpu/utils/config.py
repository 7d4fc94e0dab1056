"""Kernel tuning configuration (the reference's only config surface is its
five function arguments — SURVEY §5 config row; this adds the TPU kernel knobs
with env-var overrides for benchmarks)."""

from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Tuning knobs for the Pallas lattice kernels.

    ``use_pallas``: None = auto (Pallas on TPU, pure-XLA elsewhere);
    True/False force.  ``interpret``: run kernels in interpreter mode (CPU
    debugging/CI).  ``block_batch`` / ``block_time``: kernel tile sizes.

    Frozen and hashable: the library's internal jit caches are keyed on the
    whole config (see ``pallas_lattice._cfg_jit``), so ``config_override``
    always reaches a kernel traced under the override — never a stale
    executable compiled for a different config at the same shapes.
    """

    use_pallas: Optional[bool] = None
    interpret: bool = False
    block_batch: int = 64
    block_time: int = 16
    # Unroll the per-block time loop inside kernels (static VMEM indices;
    # larger code, less per-step scalar/loop overhead).
    unroll: bool = True
    # Time chunking for the long-sequence path: when the (padded) time axis
    # exceeds chunk_time, the [B, T, L] transition/act tensors are never
    # materialised in full; an XLA-level scan processes chunk_time-sized
    # spans through the kernels, carrying the lattice state across chunks
    # (two-level checkpointing).  Memory becomes O(B*T*V + B*chunk*L).
    chunk_time: int = 512
    # Per-sample saturation repair: when <= repair_bucket feasible samples
    # flush on the fast path, only those samples are gathered and recomputed
    # through the exact log-space pure path (then scattered back); the
    # whole-batch pure reroute is reserved for > repair_bucket flushes.
    # 0 disables the bucket (always whole-batch reroute).
    repair_bucket: int = 16
    # Escalation round size: the guard's repair machinery gathers flushed
    # samples repair_bucket2 at a time and recomputes them through the
    # exact log-space KERNELS (scattered back).  Under the default
    # guard_struct="while" this is the per-trip mini-batch of the repair
    # loop — every flushed sample is repaired in O(bucket2*T*L) memory, a
    # batch with n flushes costing ceil(n/bucket2) rounds on top of the
    # fast pass.  Under guard_struct="cond" it is the tier-2 gather bound
    # (> bucket2 flushes reroute the whole batch; 0 disables the tier).
    # Default 32 (r5 diag_ladder + r5b_struct, B=256 T=500 V=32): one
    # 32-row log-kernel round costs ~0.9-1.0 ms, putting 1/20/40/80
    # flushed samples at 1.27x/1.31x/1.63x/1.87x a clean step; 64-row
    # rounds made the small-n cases ~1.9-2.3x.  Raising the tier-1 pure
    # bucket instead was measured and rejected: the pure mini-scan is
    # latency-bound (500 sequential steps), so one 32-row KERNEL round
    # beats pure(16) even at n=1 (4.19 vs 4.64 ms).
    repair_bucket2: int = 32
    # Frozen-frame window length: per-lane exponent renormalisation and
    # roll-alignment factors are recomputed every `window` steps instead of
    # every step (the steps in between are plain f32 FMAs).  Larger windows
    # amortise the block-float machinery further but tighten the underflow
    # contract: a lane flushes if it falls 2^-126 below the running maximum
    # of its `window`-lane neighbourhood within one window (vs the same
    # lattice point per-step at window=1).
    window: int = 8
    # Stream per-step alpha residuals (f32 mantissas in-window-frame + per-
    # window frames) from the forward kernel to HBM and skip the backward
    # kernel's block re-expand phase entirely.  Trades O(B*T*L) HBM traffic
    # (overlappable with compute) for ~1/3 of the backward kernel's VPU work
    # — the scans are VPU-bound since the r2 traffic fixes.  Only applies to
    # the single-chunk geometry; the chunked long-T path always uses the
    # residual-free block-recompute scheme (streamed residuals at T=4000
    # would need ~17 GB).
    stream_residuals: bool = True
    # Sort the batch by logit_length inside the gradient impls (undone on
    # output) so batch blocks are length-homogeneous, and skip whole
    # (batch-block, time-block) kernel cells past each block's max length:
    # forced-blank steps are carry fixed points after one application, so
    # skipped cells are provably identity.  ~19% of kernel steps at the
    # reference length distribution (logit_length ~ U[T/2, T)).
    sort_by_length: bool = True
    # Runtime saturation guard (ops/topology.py): reroute to the exact
    # log-space path when a feasible sample's fast loss is non-finite
    # (logits saturated beyond float32 range, e.g. +-1e10 stability tests).
    # Disable for maximum throughput when inputs are known to be sane
    # (finite logits from a softmax head); the kernels themselves have
    # unlimited dynamic range via block-float carries.
    guard: bool = True
    # VMEM working-set budget (MB) for the block-geometry fit model
    # (pallas_lattice._fit_blocks) and the per-kernel Mosaic scoped-vmem
    # ceiling passed as ``vmem_limit_bytes``.  The fit model is deliberately
    # ~4x conservative; 36 MB admits the measured-optimal (64, 16) blocks at
    # the benchmark shapes.  Mosaic's default 16 MB scoped-vmem cap rejects
    # the backward kernel at lane widths >= 512, hence the raised limit.
    vmem_budget_mb: int = 36
    vmem_limit_mb: int = 64
    # Half-streamed residuals: the forward kernel streams only the OPEN
    # alpha mantissas ``a1 [B,T,L]`` (plus per-block a0 boundary carries);
    # the backward kernel rebuilds the closed state with its 2-op
    # recurrence ``a0' = (a0 + a1) * blank`` (same mantissa ops in the same
    # window frames, rescaled by the stored per-window frames; matches the
    # streamed pair up to compiler op-order drift — measured loss 1 ULP /
    # worst gradient element ~5e-6 relative, pinned by tests/test_fold_pt.py).
    # Halves the second-largest HBM stream of the gradient path
    # (the [B, T, 2L] alpha residuals) for ~3 extra VPU ops/step in the
    # backward kernel.  Only meaningful when stream_residuals is on.
    half_stream: bool = False
    # Stream ONE unmasked expected-token transition tensor ``dcu [B,T,L]``
    # to the classic kernels instead of the concat ``dcpt [B,T,2L]``, and
    # derive the masked diagonal (``dc = dcu * label_mask``) and the
    # preceded-token probabilities (``pt[l] = p[label[l-1]] = dcu[l-1]``,
    # a one-lane roll) in-kernel.  Halves the largest HBM stream of the
    # gradient path (written once, read by BOTH the forward and backward
    # kernels) for ~2 extra VPU ops per step; exact — the wraparound and
    # past-length lanes are structurally dead (see _step_transitions).
    # Default ON: wins at both vocabularies on the chip (V=32 3.350 vs
    # 3.509 ms, V=128 4.633 vs 4.795 ms fwd+grad — r5 corrected lever
    # sweep, benchmarks/results/r5_session1/{r3b_levers,r5_guard}.log).
    fold_pt: bool = True
    # Fuse the gradient epilogue (act-scatter matmul + probability-space
    # assembly + log-softmax VJP) into one Pallas kernel emitting d_logits
    # directly, so the ``sums`` and ``grad`` [B, T, V] intermediates never
    # round-trip HBM.  Applies on the streamed single-chunk geometry when
    # the vocabulary is lane-aligned (num_tokens % 128 == 0 — the ASR
    # V=128 shape); other geometries keep the unfused path.  The in-kernel
    # scatter runs as two bf16 MXU passes on an exact hi/lo split of the
    # acts (~2^-17 relative — tighter than the unfused HIGH einsum's 3
    # passes).  Default off until validated/measured on a real chip (the
    # interpret-mode tests pin semantics, not Mosaic lowering); enable
    # with CTC_TPU_FUSED_EPILOGUE=1 or config_override.
    fused_epilogue: bool = False
    # Where the saturation guard intercepts the training hot path
    # (autodiff.llf_bwd).  All three are semantically identical (pinned by
    # tests/test_guard_sweep.py); they differ only in which XLA structure
    # the clean path pays for (r5 chip measurements,
    # benchmarks/results/r5_session1/):
    #   "grad": guard the [B, T, V] gradient BEFORE the log-softmax
    #           epilogue (rounds 1-4 shape; scatter form + escalation cond).
    #   "post": same tiered guard, applied AFTER the epilogue to the
    #           composed d_logits inside dlogits_fast.
    #   "pre":  branch-before-backward — the flush mask comes from the
    #           forward kernel's raw loss (PackWithLoss), the entire
    #           backward sits inside one lax.cond.
    guard_mode: str = "post"
    # Structural form of the guard's escalation machinery (ops/topology.py
    # ``_guarded``), A/B-able on hardware; identical repaired values where
    # both repair a row (pinned by tests/test_guard_sweep.py):
    #   "cond":  tiered ``lax.cond`` lattice (rounds 1-5 shape) — the
    #            > bucket escalation carries the full output tensor through
    #            whole-tensor conditionals, and > bucket2 flushes reroute
    #            the WHOLE batch through the exact path (clean rows
    #            included).  Above the HBM cap, flushes beyond bucket2 keep
    #            their +inf / zero-gradient fast value.
    #   "while": the escalation is a zero-trip-when-clean
    #            ``lax.while_loop`` of gathered exact-kernel repair rounds
    #            (``repair_bucket2`` rows per trip, flushed-first order).
    #            No whole-tensor conditional anywhere: the clean path pays
    #            only the flush reduction, a [B] argsort, and the loop
    #            predicate.  Repairs ALL flushed rows in bounded
    #            O(bucket2*T*L) memory — including above the HBM cap and
    #            beyond bucket2 (strictly wider coverage than "cond");
    #            clean rows always keep their fast values.
    # Default "while" (r5b chip A/B, benchmarks/results/r5_session2/
    # r5b_struct.log): clean-path tax drops to +0.12 ms V=32 / +0.42 ms
    # V=128 (cond: +0.33/+0.60) and the whole escalation ladder improves —
    # n of 256 saturated at 1/20/40/80 rows costs 1.38x/1.36x/1.68x/1.96x
    # a clean step (cond struct: 1.34x/1.57x/3.6x/3.56x).
    guard_struct: str = "while"
    # Keep the small-cond tier-1 (pure-path bucket gather) in front of the
    # while-struct rounds: n <= repair_bucket flushes repair via the cheap
    # pure mini-batch at the cost of the tier-1 cond + bucket-row scatter
    # on the clean path.  Default OFF: measured strictly worse on chip —
    # the 500-step pure mini-scan is latency-bound, so one 32-row
    # log-KERNEL round beats it even at n=1 (4.33 vs 4.64 ms) while its
    # cond+scatter cost the clean path another ~0.15-0.27 ms
    # (r5b_struct.log).  Ignored by guard_struct="cond" (tier-1 is
    # structural there).
    guard_tier1: bool = False
    # Use the log-space Pallas kernels (ops/log_lattice.py) as the guard's
    # whole-batch exact reroute instead of the pure lax.scan path: same
    # answers (log-space f32, nothing can flush), ~4x cheaper escalation
    # when more than repair_bucket samples saturate (VERDICT r2 #3).  Costs
    # two extra kernel compiles per geometry; disable to trade the rare-case
    # cliff back for faster first-call compiles.
    log_fallback: bool = True

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        try:
            return jax.default_backend() in ("tpu",) or self.interpret
        except RuntimeError:
            return False


def _env_default() -> KernelConfig:
    kw = {}
    flag = os.environ.get("CTC_TPU_USE_PALLAS")
    if flag is not None:
        kw["use_pallas"] = flag not in ("0", "false", "False")
    if os.environ.get("CTC_TPU_PALLAS_INTERPRET") in ("1", "true", "True"):
        kw["interpret"] = True
    if os.environ.get("CTC_TPU_UNROLL") in ("0", "false", "False"):
        kw["unroll"] = False
    if os.environ.get("CTC_TPU_GUARD") in ("0", "false", "False"):
        kw["guard"] = False
    if os.environ.get("CTC_TPU_STREAM_RESIDUALS") in ("0", "false", "False"):
        kw["stream_residuals"] = False
    if os.environ.get("CTC_TPU_LOG_FALLBACK") in ("0", "false", "False"):
        kw["log_fallback"] = False
    flag = os.environ.get("CTC_TPU_FUSED_EPILOGUE")
    if flag is not None:
        kw["fused_epilogue"] = flag not in ("0", "false", "False")
    flag = os.environ.get("CTC_TPU_GUARD_MODE")
    if flag in ("grad", "post", "pre"):
        kw["guard_mode"] = flag
    flag = os.environ.get("CTC_TPU_GUARD_STRUCT")
    if flag in ("cond", "while"):
        kw["guard_struct"] = flag
    flag = os.environ.get("CTC_TPU_GUARD_TIER1")
    if flag is not None:
        kw["guard_tier1"] = flag not in ("0", "false", "False")
    flag = os.environ.get("CTC_TPU_FOLD_PT")
    if flag is not None:
        kw["fold_pt"] = flag not in ("0", "false", "False")
    if os.environ.get("CTC_TPU_HALF_STREAM") in ("1", "true", "True"):
        kw["half_stream"] = True
    if os.environ.get("CTC_TPU_SORT_BY_LENGTH") in ("0", "false", "False"):
        kw["sort_by_length"] = False
    for field, env in (
        ("block_batch", "CTC_TPU_BLOCK_BATCH"),
        ("block_time", "CTC_TPU_BLOCK_TIME"),
        ("window", "CTC_TPU_WINDOW"),
        ("repair_bucket", "CTC_TPU_REPAIR_BUCKET"),
        ("repair_bucket2", "CTC_TPU_REPAIR_BUCKET2"),
        ("chunk_time", "CTC_TPU_CHUNK_TIME"),
        ("vmem_budget_mb", "CTC_TPU_VMEM_BUDGET_MB"),
        ("vmem_limit_mb", "CTC_TPU_VMEM_LIMIT_MB"),
    ):
        val = os.environ.get(env)
        if val is not None:
            kw[field] = int(val)
    return KernelConfig(**kw)


_CONFIG = _env_default()


def get_config() -> KernelConfig:
    return _CONFIG


@contextmanager
def config_override(**kwargs):
    """Temporarily override kernel config fields (tests/benchmarks)."""
    global _CONFIG
    old = _CONFIG
    _CONFIG = dataclasses.replace(old, **kwargs)
    try:
        yield _CONFIG
    finally:
        _CONFIG = old
