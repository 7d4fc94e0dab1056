"""Worker for the real multi-process DP test (see test_multiprocess.py).

Each OS process owns half the batch, initialises JAX's multi-process
runtime over a local coordinator with gloo CPU collectives, builds ONE
global mesh, assembles host-local shards into global arrays, and computes
the sharded mean CTC loss + gradient.  Process 0 compares against a
single-process reference on the same global data.
"""

import sys

sys.path.insert(0, sys.argv[4])

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_platforms", "cpu")

from tf_seq2seq_losses_tpu.parallel import init_distributed  # noqa: E402

assert init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
    process_id=pid,
) is True

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tf_seq2seq_losses_tpu.parallel import (  # noqa: E402
    global_mesh,
    host_local_batch_to_global,
    is_primary,
    sharded_mean_ctc_loss,
)

assert jax.process_count() == nproc
mesh = global_mesh(("data",))

rng = np.random.RandomState(0)
B = 2 * nproc
all_logits = rng.randn(B, 8, 5).astype(np.float32)
all_labels = rng.randint(1, 5, (B, 3)).astype(np.int32)
local = {
    "labels": all_labels[pid * 2:(pid + 1) * 2],
    "logits": all_logits[pid * 2:(pid + 1) * 2],
    "label_length": np.full((2,), 3, np.int32),
    "logit_length": np.full((2,), 8, np.int32),
}
g = host_local_batch_to_global(mesh, local)
loss_fn = sharded_mean_ctc_loss(mesh, topology="classic")


def scalar(x):
    return loss_fn(g["labels"], x, g["label_length"], g["logit_length"])


loss, grad = jax.value_and_grad(scalar)(g["logits"])
# every process holds its local gradient shard
local_grad = np.concatenate(
    [np.asarray(s.data) for s in sorted(
        grad.addressable_shards, key=lambda s: s.index[0].start or 0
    )]
)

if is_primary():
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    labels_j = jnp.asarray(all_labels)
    ll = jnp.full((B,), 3, jnp.int32)
    gl = jnp.full((B,), 8, jnp.int32)
    want_loss = float(
        jnp.mean(classic_ctc_loss(labels_j, jnp.asarray(all_logits), ll, gl, 0))
    )
    want_grad = np.asarray(
        jax.grad(
            lambda x: jnp.mean(classic_ctc_loss(labels_j, x, ll, gl, 0))
        )(jnp.asarray(all_logits))
    )
    assert abs(float(loss) - want_loss) < 1e-5, (float(loss), want_loss)
    np.testing.assert_allclose(
        local_grad, want_grad[pid * 2:(pid + 1) * 2], atol=1e-6
    )
    print("MULTIPROCESS_DP_OK")

jax.distributed.shutdown()
