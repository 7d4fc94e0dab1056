"""Device-mesh construction and batch-sharded CTC loss.

The reference is single-device (SURVEY §2.3: no tf.distribute anywhere); the
only parallel axis a CTC loss has is the batch.  The TPU-native layer makes
that first-class:

* :func:`make_mesh` builds a ``jax.sharding.Mesh`` over the available chips
  (``('data',)`` by default, or ``('data', 'model')`` for the encoder demo).
* :func:`sharded_ctc_loss` shards the batch over ``'data'`` with
  ``shard_map``; each shard runs the full per-chip lattice kernel locally and
  no communication happens at all for per-sample losses — exactly the right
  cost model (losses are batchwise independent).
* :func:`sharded_mean_ctc_loss` adds the single collective the training step
  needs: a ``jax.lax.psum`` of the shard-local loss sums over ICI.

Multi-host: initialise with ``jax.distributed.initialize()`` before building
the mesh; the same code then spans hosts (DCN for cross-host legs).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tf_seq2seq_losses_tpu import api


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map across the supported version range.

    The replication-check kwarg was renamed ``check_rep`` -> ``check_vma``
    around jax 0.7; the scan carries here start device-invariant, so the
    check is disabled under either name."""
    import inspect

    kw = (
        "check_vma"
        if "check_vma" in inspect.signature(jax.shard_map).parameters
        else "check_rep"
    )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{kw: False}
    )


def make_mesh(
    axis_shapes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Defaults to a 1-D ``('data',)`` mesh over all devices.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if axis_shapes is None:
        axis_shapes = (len(devices),)
    needed = int(np.prod(axis_shapes))
    if needed > len(devices):
        raise ValueError(
            f"mesh {tuple(axis_shapes)} needs {needed} devices, "
            f"only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:needed]).reshape(tuple(axis_shapes))
    return Mesh(dev_array, tuple(axis_names))


def sharded_ctc_loss(
    mesh: Mesh,
    topology: str = "classic",
    blank_index: int = 0,
    data_axis: str = "data",
):
    """Per-sample CTC losses with the batch sharded over ``data_axis``.

    Returns a jitted callable ``(labels, logits, label_length, logit_length)
    -> loss [B]`` whose inputs and output are sharded over the batch.  Fully
    differentiable (the custom-VJP chain is applied per shard).
    """
    spec3 = P(data_axis, None, None)
    spec2 = P(data_axis, None)
    spec1 = P(data_axis)

    def local_fn(labels, logits, label_length, logit_length):
        return api.ctc_loss(
            labels, logits, label_length, logit_length, blank_index, topology
        )

    mapped = _shard_map(
        local_fn, mesh, (spec2, spec3, spec1, spec1), spec1
    )
    return jax.jit(mapped)


def sharded_mean_ctc_loss(
    mesh: Mesh,
    topology: str = "classic",
    blank_index: int = 0,
    data_axis: str = "data",
):
    """Global mean CTC loss: shard-local sums reduced with one ``psum``.

    The returned callable is differentiable and returns a replicated scalar.
    """
    spec3 = P(data_axis, None, None)
    spec2 = P(data_axis, None)
    spec1 = P(data_axis)

    def local_fn(labels, logits, label_length, logit_length):
        loss = api.ctc_loss(
            labels, logits, label_length, logit_length, blank_index, topology
        )
        local_sum = jnp.sum(loss)
        local_count = jnp.asarray(loss.shape[0], jnp.float32)
        total = jax.lax.psum(local_sum, data_axis)
        count = jax.lax.psum(local_count, data_axis)
        return total / count

    mapped = _shard_map(
        local_fn, mesh, (spec2, spec3, spec1, spec1), P()
    )
    return jax.jit(mapped)


def shard_batch(mesh: Mesh, tree, data_axis: str = "data"):
    """Place a pytree of batch-major arrays with the batch sharded over
    ``data_axis`` (helper for feeding :func:`sharded_ctc_loss`)."""

    def place(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)
