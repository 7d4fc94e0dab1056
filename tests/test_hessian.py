"""Second-derivative tests, ported from the reference's tests/test_hessian.py.

The reference computes Hessians with ``tape1.batch_jacobian(tape2.gradient)``;
the JAX analogue is reverse-over-reverse: ``jax.jacrev`` of ``jax.grad``
(custom-VJP functions are not forward-mode differentiable by design —
see ops/autodiff.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tests.finite_difference import finite_difference_batch_jacobian
from tf_seq2seq_losses_tpu import (
    SimplifiedCtcLossData,
    classic_ctc_loss,
    ctc_loss_from_logproba,
    ctc_loss_hessian,
    simplified_ctc_loss,
)
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba


def _batch_diag(hess):
    """[B, T, V, B, T, V] -> [B, T, V, T, V]"""
    h = np.asarray(hess)
    return np.stack([h[b, :, :, b] for b in range(h.shape[0])])


def test_single_logit_case():
    # reference: test_hessian.py:37-60
    logits = np.log(np.asarray([[[1 / 3, 1 / 3, 1 / 3]]], np.float32))
    data = SimplifiedCtcLossData(
        labels=jnp.asarray([[1]], jnp.int32),
        logprobas=logit_to_logproba(jnp.asarray(logits), 2),
        label_length=jnp.asarray([1], jnp.int32),
        logit_length=jnp.asarray([1], jnp.int32),
        blank_index=0,
    )
    np.testing.assert_allclose(
        np.asarray(data.gradient), [[[0.0, -1.0, 0.0]]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(data.hessian), np.zeros((1, 1, 3, 1, 3)), atol=1e-6
    )


def test_gamma_first_column_is_alpha():
    # reference: test_hessian.py:62-87 — gamma[:, 0, 0] == alpha
    logits = np.log(
        np.asarray(
            [[[0, 1, 0], [1, 0, 0], [0, 0, 1], [1, 0, 0], [0, 1, 0]]], np.float32
        )
    )
    data = SimplifiedCtcLossData(
        labels=jnp.asarray([[1, 2, 1]], jnp.int32),
        logprobas=logit_to_logproba(jnp.asarray(logits), 2),
        label_length=jnp.asarray([3], jnp.int32),
        logit_length=jnp.asarray([5], jnp.int32),
        blank_index=0,
    )
    np.testing.assert_array_equal(
        np.exp(np.asarray(data.gamma)[:, 0, 0]), np.exp(np.asarray(data.alpha))
    )


@pytest.mark.slow
def test_hessian_symmetry():
    # reference: test_hessian.py:89-108
    inputs = generate_ctc_loss_inputs(
        batch_size=1, max_logit_length=4, random_seed=0, num_tokens=3, blank_index=0
    )
    data = SimplifiedCtcLossData(
        labels=inputs["labels"],
        logprobas=inputs["logprobas"],
        label_length=inputs["label_length"],
        logit_length=inputs["logit_length"],
        blank_index=0,
    )
    hess = np.asarray(data.hessian)
    np.testing.assert_allclose(
        hess, np.transpose(hess, [0, 3, 4, 1, 2]), atol=1e-6
    )


@pytest.mark.slow
def test_second_derivative_shape():
    # reference: test_hessian.py:110-147
    batch_size, num_tokens, max_logit_length = 2, 3, 4
    inputs = generate_ctc_loss_inputs(
        batch_size=batch_size,
        max_logit_length=max_logit_length,
        random_seed=0,
        num_tokens=num_tokens,
        blank_index=0,
    )
    logprobas = inputs["logprobas"]

    def loss_sum(lp):
        return jnp.sum(
            ctc_loss_from_logproba(
                inputs["labels"],
                lp,
                inputs["label_length"],
                inputs["logit_length"],
                0,
                "simplified",
            )
        )

    hess = jax.jacrev(jax.grad(loss_sum))(logprobas)
    assert hess.shape == (
        batch_size,
        max_logit_length,
        num_tokens,
        batch_size,
        max_logit_length,
        num_tokens,
    )
    bd = _batch_diag(hess)
    analytic = ctc_loss_hessian(
        inputs["labels"],
        logprobas,
        inputs["label_length"],
        inputs["logit_length"],
        0,
        "simplified",
    )
    np.testing.assert_allclose(bd, np.asarray(analytic), atol=1e-5)


@pytest.mark.parametrize(
    "loss_fn",
    [
        pytest.param(classic_ctc_loss, marks=pytest.mark.slow),
        pytest.param(simplified_ctc_loss, marks=pytest.mark.slow),
    ],
)
def test_hessian_vs_finite_difference(loss_fn):
    # reference: test_hessian.py:149-183 and test_classic_ctc_loss.py:479-514
    inputs = generate_ctc_loss_inputs(
        batch_size=2, max_logit_length=4, random_seed=0, num_tokens=2, blank_index=0
    )
    logits = inputs["logits"]

    def gradient_fn(logits_):
        return jax.grad(
            lambda x: jnp.sum(
                loss_fn(
                    inputs["labels"],
                    x,
                    inputs["label_length"],
                    inputs["logit_length"],
                    0,
                )
            )
        )(logits_)

    numerical = finite_difference_batch_jacobian(gradient_fn, logits, epsilon=1e-4)
    analytic = _batch_diag(jax.jacrev(gradient_fn)(logits))
    np.testing.assert_allclose(np.asarray(numerical), analytic, atol=5e-2)


def test_readme_example_second_derivative():
    # reference: test_hessian.py:185-213
    labels = jnp.asarray([[1, 2, 2, 1], [1, 2, 1, 0]], jnp.int32)
    label_length = jnp.asarray([4, 3], jnp.int32)
    logits = jnp.zeros((2, 5, 3), jnp.float32)
    logit_length = jnp.asarray([5, 4], jnp.int32)

    def loss_sum(x):
        return jnp.sum(
            classic_ctc_loss(labels, x, label_length, logit_length, 0)
        )

    hess = jax.jacrev(jax.grad(loss_sum))(logits)
    assert hess.shape == (2, 5, 3, 2, 5, 3)
    assert np.isfinite(np.asarray(hess)).all()


def test_second_gradient_jit():
    # reference: test_hessian.py:215-257 — the whole chain under jit
    inputs = generate_ctc_loss_inputs(
        batch_size=2, max_logit_length=4, random_seed=0, num_tokens=3, blank_index=0
    )

    @jax.jit
    def func(logits):
        return jax.jacrev(
            jax.grad(
                lambda x: jnp.sum(
                    classic_ctc_loss(
                        inputs["labels"],
                        x,
                        inputs["label_length"],
                        inputs["logit_length"],
                        0,
                    )
                )
            )
        )(logits)

    hess = func(inputs["logits"])
    assert hess.shape == (2, 4, 3, 2, 4, 3)


@pytest.mark.slow
def test_third_derivative_raises():
    # reference contract: base_loss.py:177-184
    inputs = generate_ctc_loss_inputs(
        batch_size=1, max_logit_length=3, random_seed=0, num_tokens=2, blank_index=0
    )

    def loss_sum(lp):
        return jnp.sum(
            ctc_loss_from_logproba(
                inputs["labels"],
                lp,
                inputs["label_length"],
                inputs["logit_length"],
                0,
                "classic",
            )
        )

    with pytest.raises(NotImplementedError):
        jax.jacrev(jax.jacrev(jax.grad(loss_sum)))(inputs["logprobas"])
