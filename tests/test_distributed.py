"""Multi-host entry point, exercised as far as a single process allows
(VERDICT r2 next-round #5; SURVEY §2.3 DP row).

A real pod cannot be reached from this environment; these tests pin the
single-process degenerate contract (no-op initialise, process-0 identity,
host-local batch assembly == plain sharding on an 8-virtual-device mesh) so
the pod code path is mechanically validated.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.parallel import (
    global_mesh,
    host_local_batch_to_global,
    init_distributed,
    is_primary,
    make_mesh,
    shard_batch,
    sharded_mean_ctc_loss,
)


def test_init_distributed_noop_single_process(monkeypatch):
    for var in (
        "CTC_TPU_COORDINATOR",
        "CTC_TPU_NUM_PROCESSES",
        "CTC_TPU_PROCESS_ID",
        "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() is False
    assert jax.process_count() == 1
    assert is_primary()


def test_host_local_batch_matches_shard_batch():
    mesh = global_mesh(("data",))
    assert mesh.devices.size == len(jax.devices())
    rng = np.random.RandomState(0)
    local = {
        "logits": rng.randn(8, 6, 5).astype(np.float32),
        "labels": rng.randint(1, 5, (8, 3)).astype(np.int32),
    }
    g = host_local_batch_to_global(mesh, local)
    placed = shard_batch(mesh, {k: jnp.asarray(v) for k, v in local.items()})
    for k in local:
        assert g[k].shape == local[k].shape  # single process: global == local
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(placed[k]))
        assert g[k].sharding.spec == placed[k].sharding.spec


def test_global_mesh_feeds_sharded_loss():
    mesh = global_mesh(("data",))
    n = mesh.devices.size
    rng = np.random.RandomState(1)
    batch = 2 * n
    local = {
        "labels": rng.randint(1, 5, (batch, 3)).astype(np.int32),
        "logits": rng.randn(batch, 8, 5).astype(np.float32),
        "label_length": np.full((batch,), 3, np.int32),
        "logit_length": np.full((batch,), 8, np.int32),
    }
    g = host_local_batch_to_global(mesh, local)
    loss_fn = sharded_mean_ctc_loss(mesh, topology="classic")
    loss = loss_fn(g["labels"], g["logits"], g["label_length"], g["logit_length"])
    assert np.isfinite(float(loss))

    # parity with the unsharded single-device mean
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    want = jnp.mean(
        classic_ctc_loss(
            jnp.asarray(local["labels"]),
            jnp.asarray(local["logits"]),
            jnp.asarray(local["label_length"]),
            jnp.asarray(local["logit_length"]),
            0,
        )
    )
    np.testing.assert_allclose(float(loss), float(want), atol=1e-5)
