"""Distributed layer: mesh construction, sharded losses, DP x TP train step,
multi-host initialisation."""

from tf_seq2seq_losses_tpu.parallel.distributed import (
    global_mesh,
    host_local_batch_to_global,
    init_distributed,
    is_primary,
)
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
    "init_distributed",
    "is_primary",
    "global_mesh",
    "host_local_batch_to_global",
    "make_mesh",
    "shard_batch",
    "sharded_ctc_loss",
    "sharded_mean_ctc_loss",
    "TrainState",
    "make_train_step",
    "param_shardings",
]
