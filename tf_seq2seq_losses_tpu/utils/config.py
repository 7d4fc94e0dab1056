"""Kernel tuning configuration (the reference's only config surface is its
five function arguments — SURVEY §5 config row; this adds the TPU kernel knobs
with env-var overrides for benchmarks)."""

from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager
from typing import Optional

import jax


@dataclasses.dataclass
class KernelConfig:
    """Tuning knobs for the Pallas lattice kernels.

    ``use_pallas``: None = auto (Pallas on TPU, pure-XLA elsewhere);
    True/False force.  ``interpret``: run kernels in interpreter mode (CPU
    debugging/CI).  ``block_batch`` / ``block_time``: kernel tile sizes.
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
    # Frozen-frame window length: per-lane exponent renormalisation and
    # roll-alignment factors are recomputed every `window` steps instead of
    # every step (the steps in between are plain f32 FMAs).  Larger windows
    # amortise the block-float machinery further but tighten the underflow
    # contract: a lane flushes if it falls 2^-126 below the running maximum
    # of its `window`-lane neighbourhood within one window (vs the same
    # lattice point per-step at window=1).
    window: int = 8
    # Runtime saturation guard (ops/topology.py): reroute to the exact
    # log-space path when a feasible sample's fast loss is non-finite
    # (logits saturated beyond float32 range, e.g. +-1e10 stability tests).
    # Disable for maximum throughput when inputs are known to be sane
    # (finite logits from a softmax head); the kernels themselves have
    # unlimited dynamic range via block-float carries.
    guard: bool = True

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        try:
            return jax.default_backend() in ("tpu",) or self.interpret
        except RuntimeError:
            return False


def _env_default() -> KernelConfig:
    cfg = KernelConfig()
    flag = os.environ.get("CTC_TPU_USE_PALLAS")
    if flag is not None:
        cfg.use_pallas = flag not in ("0", "false", "False")
    if os.environ.get("CTC_TPU_PALLAS_INTERPRET") in ("1", "true", "True"):
        cfg.interpret = True
    cfg.block_batch = int(os.environ.get("CTC_TPU_BLOCK_BATCH", cfg.block_batch))
    cfg.block_time = int(os.environ.get("CTC_TPU_BLOCK_TIME", cfg.block_time))
    if os.environ.get("CTC_TPU_UNROLL") in ("0", "false", "False"):
        cfg.unroll = False
    cfg.window = int(os.environ.get("CTC_TPU_WINDOW", cfg.window))
    cfg.repair_bucket = int(
        os.environ.get("CTC_TPU_REPAIR_BUCKET", cfg.repair_bucket)
    )
    cfg.chunk_time = int(os.environ.get("CTC_TPU_CHUNK_TIME", cfg.chunk_time))
    if os.environ.get("CTC_TPU_GUARD") in ("0", "false", "False"):
        cfg.guard = False
    return cfg


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
