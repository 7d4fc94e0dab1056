"""Model layer: flagship CTC encoder demo + greedy decoders."""

from tf_seq2seq_losses_tpu.models.decoding import (
    greedy_decode_classic,
    greedy_decode_simplified,
)
from tf_seq2seq_losses_tpu.models.encoder import (
    apply_encoder,
    init_encoder,
    subsampled_length,
)

__all__ = [
    "apply_encoder",
    "init_encoder",
    "subsampled_length",
    "greedy_decode_classic",
    "greedy_decode_simplified",
]
