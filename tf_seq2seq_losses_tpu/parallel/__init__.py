"""Distributed layer: mesh construction, sharded losses, DP x TP train step."""

from tf_seq2seq_losses_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    sharded_ctc_loss,
    sharded_mean_ctc_loss,
)
from tf_seq2seq_losses_tpu.parallel.train import (
    TrainState,
    make_train_step,
    param_shardings,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "sharded_ctc_loss",
    "sharded_mean_ctc_loss",
    "TrainState",
    "make_train_step",
    "param_shardings",
]
