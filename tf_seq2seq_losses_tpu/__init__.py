"""tf-seq2seq-losses-tpu: TPU-native CTC losses in JAX.

A from-scratch, TPU-first re-design of ``alexeytochin/tf_seq2seq_losses``:
numerically stable log-space forward-backward CTC recursions with analytic
gradients and Hessians, implemented as ``jax.lax.scan`` / Pallas TPU kernels
behind a nested ``jax.custom_vjp`` chain, sharding data-parallel over
``jax.sharding.Mesh``.

Public surface mirrors the reference's
(/root/reference/tf_seq2seq_losses/__init__.py:22-28) plus direct analytic
accessors and the parallel/model layers.
"""

from tf_seq2seq_losses_tpu.api import (
    BaseCtcLossData,
    ClassicCtcLossData,
    SimplifiedCtcLossData,
    classic_ctc_loss,
    ctc_loss,
    ctc_beam_search_decode,
    ctc_greedy_decode,
    ctc_forced_alignment,
    ctc_loss_from_logproba,
    ctc_loss_gradient,
    ctc_loss_hessian,
    ctc_loss_hessian_vector_product,
    ctc_sample_alignments,
    ctc_token_posteriors,
    simplified_ctc_loss,
)

__version__ = "0.1.0"
__all__ = [
    "classic_ctc_loss",
    "simplified_ctc_loss",
    "ctc_loss",
    "ctc_loss_from_logproba",
    "ctc_loss_gradient",
    "ctc_loss_hessian",
    "ctc_loss_hessian_vector_product",
    "ctc_forced_alignment",
    "ctc_beam_search_decode",
    "ctc_greedy_decode",
    "ctc_token_posteriors",
    "ctc_sample_alignments",
    "BaseCtcLossData",
    "ClassicCtcLossData",
    "SimplifiedCtcLossData",
]
