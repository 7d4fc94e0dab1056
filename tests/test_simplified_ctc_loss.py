"""Simplified-topology tests, ported from the reference's
tests/test_simplified_ctc_loss.py (same oracles, same tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import generate_ctc_loss_inputs
from tests.finite_difference import finite_difference_batch_jacobian
from tf_seq2seq_losses_tpu import SimplifiedCtcLossData, simplified_ctc_loss
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba


def _data(logits, labels, label_length, logit_length, blank_index=0):
    return SimplifiedCtcLossData(
        labels=jnp.asarray(labels, dtype=jnp.int32),
        logprobas=logit_to_logproba(jnp.asarray(logits, dtype=jnp.float32), 2),
        label_length=jnp.asarray(label_length, dtype=jnp.int32),
        logit_length=jnp.asarray(logit_length, dtype=jnp.int32),
        blank_index=blank_index,
    )


def test_simple_case():
    # reference: test_simplified_ctc_loss.py:35-91 (exact equality)
    data = _data(
        logits=np.log(
            np.asarray(
                [[[0, 1, 0], [1, 0, 0], [0, 0, 1], [1, 0, 0], [0, 1, 0]]],
                np.float32,
            )
        ),
        labels=[[1, 2, 1]],
        label_length=[3],
        logit_length=[5],
    )
    expected = np.asarray(
        [
            [
                [1.0, 0.0, 0.0, 0.0],
                [0.0, 1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0, 0.0],
                [0.0, 0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0, 0.0],
                [0.0, 0.0, 0.0, 1.0],
            ]
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.exp(data.alpha), expected)
    np.testing.assert_array_equal(np.exp(data.beta), expected)
    assert float(data.loss[0]) < 1e-6


def test_non_zero_blank_index():
    # reference: test_simplified_ctc_loss.py:93-115
    data = _data(
        logits=np.log(
            np.asarray(
                [[[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0]]],
                np.float32,
            )
        ),
        labels=[[0, 2, 0]],
        label_length=[3],
        logit_length=[5],
        blank_index=1,
    )
    assert float(data.loss[0]) < 1e-6


def test_shorter_logit_and_label_length():
    # reference: test_simplified_ctc_loss.py:117-138
    data = _data(
        logits=np.log(
            np.asarray([[[1, 0, 0], [0, 1, 0], [1, 0, 0], [1, 0, 0]]], np.float32)
        ),
        labels=[[1, 0]],
        label_length=[1],
        logit_length=[3],
    )
    assert float(data.loss[0]) == 0.0


def test_label_length_bigger_than_logit_length():
    # reference: test_simplified_ctc_loss.py:140-160
    data = _data(
        logits=np.asarray([[[0, 0, 0]]], np.float32),
        labels=[[1, 2]],
        label_length=[2],
        logit_length=[1],
    )
    assert np.isposinf(np.asarray(data.loss)[0])
    np.testing.assert_array_equal(
        np.asarray(data.gradient), np.zeros((1, 1, 3), np.float32)
    )


def test_large_loss():
    # reference: test_simplified_ctc_loss.py:162-183 — saturated logits 1e10
    data = _data(
        logits=np.asarray([[[1e10, 0.0, 0.0]]], np.float32),
        labels=[[1]],
        label_length=[1],
        logit_length=[1],
    )
    assert float(data.loss[0]) == 1e10
    np.testing.assert_array_equal(
        np.asarray(data.gradient), np.asarray([[[0.0, -1.0, 0.0]]], np.float32)
    )


def test_alpha_beta_sum():
    # reference: test_simplified_ctc_loss.py:185-206
    inputs = generate_ctc_loss_inputs(
        batch_size=1, max_logit_length=6, random_seed=1, num_tokens=5, blank_index=0
    )
    data = SimplifiedCtcLossData(
        labels=inputs["labels"],
        logprobas=inputs["logprobas"],
        label_length=inputs["label_length"],
        logit_length=inputs["logit_length"],
        blank_index=0,
    )
    sums = np.asarray(jax.scipy.special.logsumexp(data.alpha + data.beta, axis=2))
    np.testing.assert_allclose(
        sums, np.broadcast_to(-np.asarray(data.loss)[:, None], sums.shape), atol=1e-5
    )


def test_length_one():
    # reference: test_simplified_ctc_loss.py:208-230
    data = _data(
        logits=np.zeros((1, 1, 3), np.float32),
        labels=[[1]],
        label_length=[1],
        logit_length=[1],
    )
    assert np.isclose(float(data.loss[0]), np.log(3), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(data.gradient), [[[0.0, -1.0, 0.0]]], atol=1e-6
    )


def test_length_two():
    # reference: test_simplified_ctc_loss.py:232-258
    data = _data(
        logits=np.zeros((1, 2, 3), np.float32),
        labels=[[1, 2]],
        label_length=[2],
        logit_length=[2],
    )
    assert np.isclose(float(data.loss[0]), 2 * np.log(3), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(data.gradient),
        [[[0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]],
        atol=1e-6,
    )


def test_gradient_with_finite_difference():
    # reference: test_simplified_ctc_loss.py:260-291
    inputs = generate_ctc_loss_inputs(
        batch_size=1, max_logit_length=4, random_seed=0, num_tokens=3, blank_index=0
    )
    logits = inputs["logits"]

    def loss_fn(logits_):
        return simplified_ctc_loss(
            inputs["labels"],
            logits_,
            inputs["label_length"],
            inputs["logit_length"],
            0,
        )

    numerical = finite_difference_batch_jacobian(loss_fn, logits, epsilon=1e-5)
    analytic = jax.grad(lambda x: jnp.sum(loss_fn(x)))(logits)
    np.testing.assert_allclose(
        np.asarray(numerical), np.asarray(analytic), atol=5e-2
    )


def test_jit_gradient():
    # reference: test_simplified_ctc_loss.py:293-320 (autograph analogue)
    inputs = generate_ctc_loss_inputs(
        batch_size=2, max_logit_length=6, random_seed=0, num_tokens=3, blank_index=0
    )

    @jax.jit
    def func(logits):
        return jax.grad(
            lambda x: jnp.mean(
                simplified_ctc_loss(
                    inputs["labels"],
                    x,
                    inputs["label_length"],
                    inputs["logit_length"],
                    0,
                )
            )
        )(logits)

    grad = func(inputs["logits"])
    assert grad.shape == inputs["logits"].shape
    assert np.isfinite(np.asarray(grad)).all()


def test_zero_logit_length():
    # reference: test_simplified_ctc_loss.py:322-343
    logits = jnp.zeros((1, 0, 3), jnp.float32)
    labels = jnp.asarray([[1, 2]], jnp.int32)

    @jax.jit
    def func(logits_):
        loss = simplified_ctc_loss(
            labels, logits_, jnp.asarray([2]), jnp.asarray([2]), 0
        )
        grad = jax.grad(
            lambda x: jnp.sum(
                simplified_ctc_loss(
                    labels, x, jnp.asarray([2]), jnp.asarray([2]), 0
                )
            )
        )(logits_)
        return loss, grad

    loss, grad = func(logits)
    assert np.isposinf(np.asarray(loss)[0])
    assert grad.shape == (1, 0, 3)


def test_zero_batch_size():
    # reference: test_simplified_ctc_loss.py:345-366
    logits = jnp.zeros((0, 4, 3), jnp.float32)
    labels = jnp.zeros((0, 2), jnp.int32)
    lengths = jnp.zeros((0,), jnp.int32)

    loss = simplified_ctc_loss(labels, logits, lengths, lengths, 0)
    grad = jax.grad(
        lambda x: jnp.sum(simplified_ctc_loss(labels, x, lengths, lengths, 0))
    )(logits)
    assert loss.shape == (0,)
    assert grad.shape == (0, 4, 3)
