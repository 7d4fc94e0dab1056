"""Utilities: numerics toolkit, kernel config, profiling, debug guards."""

from tf_seq2seq_losses_tpu.utils.config import (
    KernelConfig,
    config_override,
    get_config,
)

__all__ = ["KernelConfig", "config_override", "get_config"]
