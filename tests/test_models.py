"""Flagship encoder tests: shapes, lengths, and end-to-end CTC training."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.models import encoder as enc


def test_encoder_shapes_and_lengths():
    params = enc.init_encoder(
        jax.random.PRNGKey(0), num_features=8, hidden=16, vocab=6, num_layers=2
    )
    feats = jnp.zeros((3, 21, 8), jnp.float32)
    logits = enc.apply_encoder(params, feats)
    assert logits.shape == (3, 11, 6)  # ceil(21/2)
    assert logits.dtype == jnp.float32
    lengths = enc.subsampled_length(jnp.asarray([21, 20, 1], jnp.int32))
    np.testing.assert_array_equal(np.asarray(lengths), [11, 10, 1])


def test_end_to_end_training_decreases_loss():
    params = enc.init_encoder(
        jax.random.PRNGKey(1), num_features=4, hidden=16, vocab=5, num_layers=1
    )
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 12, 4).astype(np.float32))
    feat_len = jnp.asarray([12, 10], jnp.int32)
    labels = jnp.asarray([[1, 2, 3], [4, 2, 0]], jnp.int32)
    label_len = jnp.asarray([3, 2], jnp.int32)

    def loss_fn(p):
        logits = enc.apply_encoder(p, feats)
        losses = classic_ctc_loss(
            labels, logits, label_len, enc.subsampled_length(feat_len), 0
        )
        return jnp.mean(losses)

    @jax.jit
    def step(p):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        p = jax.tree_util.tree_map(lambda a, g: a - 0.1 * g, p, grads)
        return p, loss

    losses = []
    for _ in range(30):
        params, loss = step(params)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0]


def test_greedy_decode_classic_and_simplified():
    import jax.numpy as jnp

    from tf_seq2seq_losses_tpu.models.decoding import (
        greedy_decode_classic,
        greedy_decode_simplified,
    )

    # argmax sequence: a _ b b _ c  ->  classic: a b c ; simplified: a b b c
    a, b, c, blank = 1, 2, 3, 0
    seq = [a, blank, b, b, blank, c]
    logits = jnp.asarray(
        np.eye(4, dtype=np.float32)[np.asarray(seq)][None] * 10.0
    )  # [1, 6, 4]
    length = jnp.asarray([6], jnp.int32)

    toks, n = greedy_decode_classic(logits, length, blank_index=0)
    assert int(n[0]) == 3
    assert np.asarray(toks)[0, :3].tolist() == [a, b, c]

    toks, n = greedy_decode_simplified(logits, length, blank_index=0)
    assert int(n[0]) == 4
    assert np.asarray(toks)[0, :4].tolist() == [a, b, b, c]

    # logit_length masking: only the first 3 frames are valid -> classic "a b"
    toks, n = greedy_decode_classic(logits, jnp.asarray([3]), blank_index=0)
    assert int(n[0]) == 2
    assert np.asarray(toks)[0, :2].tolist() == [a, b]


def test_bfloat16_logits_accepted():
    import jax
    import jax.numpy as jnp

    from tf_seq2seq_losses_tpu import classic_ctc_loss

    labels = jnp.asarray([[1, 2]], jnp.int32)
    logits32 = jnp.asarray(np.random.RandomState(0).randn(1, 6, 4), jnp.float32)
    l32 = classic_ctc_loss(labels, logits32, jnp.asarray([2]), jnp.asarray([6]), 0)
    l16 = classic_ctc_loss(
        labels,
        logits32.astype(jnp.bfloat16),
        jnp.asarray([2]),
        jnp.asarray([6]),
        0,
    )
    # bf16 inputs are upcast internally; result close to f32 within bf16 noise
    np.testing.assert_allclose(
        np.asarray(l16, np.float32), np.asarray(l32), atol=0.05
    )
    g = jax.grad(
        lambda x: classic_ctc_loss(
            labels, x, jnp.asarray([2]), jnp.asarray([6]), 0
        ).sum()
    )(logits32.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16
