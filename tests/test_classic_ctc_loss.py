"""Classic-topology tests, ported from the reference's
tests/test_classic_ctc_loss.py (same oracles, same tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tests.finite_difference import finite_difference_batch_jacobian
from tf_seq2seq_losses_tpu import ClassicCtcLossData, classic_ctc_loss
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba


def _data(logits, labels, label_length, logit_length, blank_index=0):
    return ClassicCtcLossData(
        labels=jnp.asarray(labels, dtype=jnp.int32),
        logprobas=logit_to_logproba(jnp.asarray(logits, dtype=jnp.float32), 2),
        label_length=jnp.asarray(label_length, dtype=jnp.int32),
        logit_length=jnp.asarray(logit_length, dtype=jnp.int32),
        blank_index=blank_index,
    )


def test_single_logit_case():
    # reference: test_classic_ctc_loss.py:33-65 (exact equality)
    data = _data(
        logits=np.log(np.asarray([[[0, 1, 0]]], np.float32)),
        labels=[[1]],
        label_length=[1],
        logit_length=[1],
    )
    np.testing.assert_array_equal(
        np.exp(data.alpha),
        np.asarray([[[[1, 0], [0, 0]], [[0, 0], [0, 1]]]], np.float32),
    )
    np.testing.assert_array_equal(
        np.exp(data.beta),
        np.asarray([[[[1, 1], [0, 1]], [[0, 0], [1, 1]]]], np.float32),
    )
    assert float(data.loss[0]) == 0.0
    np.testing.assert_allclose(
        np.exp(data.logarithmic_logproba_gradient), [[[0.0, 1.0, 0.0]]], atol=1e-6
    )


def test_closed_state():
    # reference: test_classic_ctc_loss.py:67-105
    data = _data(
        logits=np.log(np.asarray([[[0, 1, 0], [1, 0, 0]]], np.float32)),
        labels=[[1]],
        label_length=[1],
        logit_length=[2],
    )
    np.testing.assert_array_equal(
        np.exp(data.alpha),
        np.asarray(
            [[[[1, 0], [0, 0]], [[0, 0], [0, 1]], [[0, 0], [1, 0]]]], np.float32
        ),
    )
    np.testing.assert_array_equal(
        np.exp(data.beta),
        np.asarray(
            [[[[1, 1], [0, 1]], [[0, 0], [1, 1]], [[0, 0], [1, 1]]]], np.float32
        ),
    )
    assert float(data.loss[0]) == 0.0
    np.testing.assert_allclose(
        np.exp(data.logarithmic_logproba_gradient),
        [[[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]],
        atol=1e-6,
    )


def test_classic_loss_simple_case():
    # reference: test_classic_ctc_loss.py:107-144
    data = _data(
        logits=np.log(
            np.asarray(
                [[[0, 1, 0], [0, 0, 1], [1, 0, 0], [0, 0, 1], [0, 1, 0]]],
                np.float32,
            )
        ),
        labels=[[1, 2, 2, 1]],
        label_length=[4],
        logit_length=[5],
    )
    assert float(data.loss[0]) < 1e-6
    np.testing.assert_allclose(
        np.exp(data.logarithmic_logproba_gradient),
        [
            [
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [1.0, 0.0, 0.0],
                [0.0, 0.0, 1.0],
                [0.0, 1.0, 0.0],
            ]
        ],
        atol=1e-6,
    )


def test_alpha_beta_sum():
    # reference: test_classic_ctc_loss.py:146-167 — logsumexp_{l,s}(a+b) = -loss
    inputs = generate_ctc_loss_inputs(
        batch_size=1, max_logit_length=6, random_seed=0, num_tokens=5, blank_index=0
    )
    data = ClassicCtcLossData(
        labels=inputs["labels"],
        logprobas=inputs["logprobas"],
        label_length=inputs["label_length"],
        logit_length=inputs["logit_length"],
        blank_index=0,
    )
    sums = np.asarray(
        jax.scipy.special.logsumexp(data.alpha + data.beta, axis=(2, 3))
    )
    np.testing.assert_allclose(
        sums, np.broadcast_to(-np.asarray(data.loss)[:, None], sums.shape), atol=1e-5
    )


def test_length_two_case():
    # reference: test_classic_ctc_loss.py:169-199
    data = _data(
        logits=np.zeros((2, 2, 3), np.float32),
        labels=[[1, 2], [1, 2]],
        label_length=[2, 1],
        logit_length=[2, 2],
    )
    assert np.isclose(float(data.loss[0]), -np.log(1 / 9), atol=1e-6)
    assert np.isclose(float(data.loss[1]), -np.log(3 / 9), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(data.gradient),
        [
            [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0]],
            [[-1 / 3, -2 / 3, 0.0], [-1 / 3, -2 / 3, 0.0]],
        ],
        atol=1e-6,
    )


def test_too_short_logit():
    # reference: test_classic_ctc_loss.py:201-241 — +inf loss, zero grad/Hessian
    data = _data(
        logits=np.zeros((1, 2, 3), np.float32),
        labels=[[1, 1]],
        label_length=[2],
        logit_length=[2],
    )
    assert np.isposinf(np.asarray(data.loss)[0])
    np.testing.assert_array_equal(
        np.asarray(data.gradient), np.zeros((1, 2, 3), np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(data.hessian), np.zeros((1, 2, 3, 2, 3), np.float32)
    )


def test_repeated_token():
    # reference: test_classic_ctc_loss.py:243-262 — "aa" has one path "a_a"
    data = _data(
        logits=np.zeros((1, 3, 3), np.float32),
        labels=[[1, 1]],
        label_length=[2],
        logit_length=[3],
    )
    assert np.isclose(float(data.loss[0]), np.log(3**3), atol=1e-5)


def test_single_token():
    # reference: test_classic_ctc_loss.py:264-283 — "a" has 6 paths over T=3
    data = _data(
        logits=np.zeros((1, 3, 3), np.float32),
        labels=[[1]],
        label_length=[1],
        logit_length=[3],
    )
    assert np.isclose(float(data.loss[0]), np.log(3**3 / 6), atol=1e-5)


def test_wrong_prediction_case():
    # reference: test_classic_ctc_loss.py:285-307
    data = _data(
        logits=np.asarray([[[0, 0, 1]]], np.float32) * 100,
        labels=[[1]],
        label_length=[1],
        logit_length=[1],
    )
    np.testing.assert_array_equal(
        np.asarray(data.gradient), np.asarray([[[0.0, -1.0, 0.0]]], np.float32)
    )
    assert float(data.loss[0]) == 100.0


def test_zero_batch_size_with_jit():
    # reference: test_classic_ctc_loss.py:309-330
    logits = jnp.zeros((0, 4, 3), jnp.float32)
    labels = jnp.zeros((0, 2), jnp.int32)
    lengths = jnp.zeros((0,), jnp.int32)

    @jax.jit
    def func(logits_):
        loss = classic_ctc_loss(labels, logits_, lengths, lengths, 0)
        grad = jax.grad(
            lambda x: jnp.sum(classic_ctc_loss(labels, x, lengths, lengths, 0))
        )(logits_)
        return loss, grad

    loss, grad = func(logits)
    assert loss.shape == (0,)
    assert grad.shape == (0, 4, 3)


@pytest.mark.slow
def test_gradient_vs_finite_difference():
    # reference: test_classic_ctc_loss.py:395-425 (epsilon=1e-3, 2 places)
    inputs = generate_ctc_loss_inputs(
        batch_size=1, max_logit_length=16, random_seed=0, num_tokens=4, blank_index=0
    )
    logits = inputs["logits"]

    def loss_fn(logits_):
        return classic_ctc_loss(
            inputs["labels"],
            logits_,
            inputs["label_length"],
            inputs["logit_length"],
            0,
        )

    numerical = finite_difference_batch_jacobian(loss_fn, logits, epsilon=1e-3)
    analytic = jax.grad(lambda x: jnp.sum(loss_fn(x)))(logits)
    np.testing.assert_allclose(
        np.asarray(numerical), np.asarray(analytic), atol=5e-3
    )


def test_readme_example():
    # reference: test_classic_ctc_loss.py:427-441
    loss = classic_ctc_loss(
        labels=jnp.asarray([[1, 2, 2, 1]], jnp.int32),
        logits=jnp.zeros((1, 5, 3), jnp.float32),
        label_length=jnp.asarray([4], jnp.int32),
        logit_length=jnp.asarray([5], jnp.int32),
        blank_index=0,
    )
    assert np.isfinite(np.asarray(loss)).all()


def test_non_trivial_blank_index():
    # blank=2: relabel the blank=0 oracle case and expect the same loss
    data0 = _data(
        logits=np.zeros((2, 2, 3), np.float32),
        labels=[[1, 2], [1, 2]],
        label_length=[2, 1],
        logit_length=[2, 2],
    )
    data2 = _data(
        logits=np.zeros((2, 2, 3), np.float32),
        labels=[[1, 0], [1, 0]],
        label_length=[2, 1],
        logit_length=[2, 2],
        blank_index=2,
    )
    np.testing.assert_allclose(
        np.asarray(data0.loss), np.asarray(data2.loss), atol=1e-6
    )
