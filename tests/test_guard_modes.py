"""The three guard placements (``config.guard_mode``) are semantically
identical: "grad" (rounds 1-4: guard the [B, T, V] gradient before the
log-softmax epilogue), "post" (same tiered guard on the composed d_logits
— the measured default, benchmarks/results/r5_session1/r5_guard_modes.log),
and "pre" (branch-before-backward via the PackWithLoss forward flush
signal).  Values must agree bitwise on clean AND saturated batches — the
repair tiers run the same exact functions in every mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override

B, T, V = 8, 6, 4
INTERP = dict(
    use_pallas=True, interpret=True, block_batch=2, block_time=4,
    repair_bucket=2, repair_bucket2=4, sort_by_length=False,
)


def _args(n_flushed):
    rand = np.random.RandomState(0)
    logits = rand.randn(B, T, V).astype(np.float32)
    logits[:n_flushed] = 0.0
    logits[:n_flushed, :, V - 1] = 100.0
    labels = np.tile(np.array([[1, 2]], np.int32), (B, 1))
    return (
        jnp.asarray(labels),
        jnp.asarray(logits),
        jnp.full((B,), 2, jnp.int32),
        jnp.full((B,), T, jnp.int32),
    )


@pytest.mark.parametrize("loss_fn", [classic_ctc_loss, simplified_ctc_loss])
@pytest.mark.parametrize("n_flushed", [0, 3, B])
def test_guard_modes_agree(loss_fn, n_flushed):
    labels, logits, ll, tl = _args(n_flushed)

    def scalar(x):
        out = loss_fn(labels, x, ll, tl, 0)
        w = jnp.arange(1.0, B + 1.0)  # non-uniform cotangent: aux gathering
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0) * w)

    grads = {}
    for mode in ("grad", "post", "pre"):
        with config_override(guard_mode=mode, **INTERP):
            grads[mode] = jax.grad(scalar)(logits)
    for mode in ("post", "pre"):
        np.testing.assert_array_equal(
            np.asarray(grads[mode]),
            np.asarray(grads["grad"]),
            err_msg=f"{loss_fn.__name__} mode={mode} n={n_flushed}",
        )
