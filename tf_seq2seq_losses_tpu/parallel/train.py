"""Data-parallel (+ optional tensor-parallel) CTC training step.

The end-to-end configuration the BASELINE north star names: utterance batches
shard over ``'data'``; the encoder's hidden dimension optionally shards over
``'model'``; gradients reduce over ICI.  Built on ``jax.jit`` with
``NamedSharding`` constraints — XLA inserts the collectives (psum for DP grad
reduction, all-gather/reduce-scatter for the TP matmuls); no hand-written
transport, which *is* the TPU-native equivalent of the NCCL layer the
reference never had (SURVEY §2.3).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tf_seq2seq_losses_tpu import api
from tf_seq2seq_losses_tpu.models import encoder as enc


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def _param_spec(path: str, mesh: Mesh, model_axis: Optional[str]):
    """Sharding rule: shard every hidden-dim matrix over the model axis."""
    if model_axis is None or model_axis not in mesh.axis_names:
        return P()
    # MLP up-projections shard their output dim; down-projections their input
    # dim; head shards its input dim. Biases/norms stay replicated.
    if path.endswith("up/w"):
        return P(None, model_axis)
    if path.endswith("up/b"):
        return P(model_axis)
    if path.endswith("down/w"):
        return P(model_axis, None)
    if path.endswith("head/w"):
        return P(None, model_axis)
    if path.endswith("head/b"):
        return P(model_axis)
    return P()


def param_shardings(params, mesh: Mesh, model_axis: Optional[str] = "model"):
    """NamedSharding pytree for the encoder parameters."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [walk(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
            return type(tree)(out)
        return NamedSharding(mesh, _param_spec(prefix, mesh, model_axis))

    return walk(params)


def make_train_step(
    mesh: Mesh,
    learning_rate: float = 1e-3,
    topology: str = "classic",
    blank_index: int = 0,
    data_axis: str = "data",
    model_axis: Optional[str] = "model",
    optimizer=None,
):
    """Build ``init_state`` and a jitted sharded ``train_step``.

    ``train_step(state, batch) -> (state, loss)`` where ``batch`` is a dict
    with ``features [B, T, F]``, ``feature_length [B]``, ``labels [B, L]``,
    ``label_length [B]`` — batch-major, sharded over ``data_axis``.
    """
    import optax

    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    def loss_fn(params, batch):
        logits = enc.apply_encoder(params, batch["features"])
        logit_length = enc.subsampled_length(batch["feature_length"])
        losses = api.ctc_loss(
            batch["labels"],
            logits,
            batch["label_length"],
            logit_length,
            blank_index,
            topology,
        )
        # Infeasible samples carry +inf loss; keep the mean finite by masking
        # them out of the objective (their gradient is exactly zero anyway).
        finite = jnp.isfinite(losses)
        safe = jnp.where(finite, losses, 0.0)
        denom = jnp.maximum(jnp.sum(finite.astype(jnp.float32)), 1.0)
        return jnp.sum(safe) / denom

    def train_step(state: TrainState, batch) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    def shard_batch(batch: Dict[str, jax.Array]):
        return {
            k: jax.device_put(
                v, NamedSharding(mesh, P(data_axis, *([None] * (v.ndim - 1))))
            )
            for k, v in batch.items()
        }

    def init_state(params) -> TrainState:
        p_shard = param_shardings(params, mesh, model_axis)
        params = jax.device_put(params, p_shard)
        opt_state = opt.init(params)
        return TrainState(params, opt_state)

    # Shardings follow the data: placing params (DP-replicated / TP-sharded)
    # and the batch (DP-sharded) is enough for jit to partition the step and
    # insert the psum/all-gather collectives.
    return init_state, shard_batch, jax.jit(train_step)
