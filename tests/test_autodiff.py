"""Tests for the nested custom-VJP chain (ops/autodiff.py).

Verifies the reference contract (base_loss.py:140-184): first derivative =
analytic gradient, second = analytic Hessian contraction, third raises; plus
JAX-specific guarantees (jit, vmap of the loss, value_and_grad, infeasible
samples produce exactly zero cotangents).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tf_seq2seq_losses_tpu import (
    ctc_loss_from_logproba,
    ctc_loss_gradient,
    ctc_loss_hessian,
)


@pytest.fixture(
    params=["classic", pytest.param("simplified", marks=pytest.mark.slow)]
)
def topology(request):
    return request.param


def _inputs():
    return generate_ctc_loss_inputs(
        batch_size=2, max_logit_length=5, random_seed=0, num_tokens=3, blank_index=0
    )


def test_grad_is_analytic(topology):
    inputs = _inputs()
    lp = inputs["logprobas"]
    auto = jax.grad(
        lambda x: jnp.sum(
            ctc_loss_from_logproba(
                inputs["labels"],
                x,
                inputs["label_length"],
                inputs["logit_length"],
                0,
                topology,
            )
        )
    )(lp)
    analytic = ctc_loss_gradient(
        inputs["labels"],
        lp,
        inputs["label_length"],
        inputs["logit_length"],
        0,
        topology,
    )
    np.testing.assert_allclose(np.asarray(auto), np.asarray(analytic), atol=1e-6)


def test_hessian_is_analytic(topology):
    inputs = _inputs()
    lp = inputs["logprobas"]

    def loss_sum(x):
        return jnp.sum(
            ctc_loss_from_logproba(
                inputs["labels"],
                x,
                inputs["label_length"],
                inputs["logit_length"],
                0,
                topology,
            )
        )

    full = np.asarray(jax.jacrev(jax.grad(loss_sum))(lp))
    batch_diag = np.stack([full[b, :, :, b] for b in range(full.shape[0])])
    analytic = ctc_loss_hessian(
        inputs["labels"],
        lp,
        inputs["label_length"],
        inputs["logit_length"],
        0,
        topology,
    )
    np.testing.assert_allclose(batch_diag, np.asarray(analytic), atol=1e-5)
    # cross-batch blocks of the Jacobian are exactly zero
    for b1 in range(full.shape[0]):
        for b2 in range(full.shape[0]):
            if b1 != b2:
                assert np.all(full[b1, :, :, b2] == 0.0)


def test_third_derivative_raises(topology):
    inputs = _inputs()

    def loss_sum(x):
        return jnp.sum(
            ctc_loss_from_logproba(
                inputs["labels"],
                x,
                inputs["label_length"],
                inputs["logit_length"],
                0,
                topology,
            )
        )

    with pytest.raises(NotImplementedError, match="Third order"):
        jax.jacrev(jax.jacrev(jax.grad(loss_sum)))(inputs["logprobas"])


def test_value_and_grad_under_jit(topology):
    inputs = _inputs()

    @jax.jit
    def step(x):
        return jax.value_and_grad(
            lambda y: jnp.mean(
                ctc_loss_from_logproba(
                    inputs["labels"],
                    y,
                    inputs["label_length"],
                    inputs["logit_length"],
                    0,
                    topology,
                )
            )
        )(x)

    value, grad = step(inputs["logprobas"])
    assert np.isfinite(float(value))
    assert grad.shape == inputs["logprobas"].shape
    assert np.isfinite(np.asarray(grad)).all()


def test_infeasible_sample_zero_gradient(topology):
    # one infeasible sample mixed into the batch: its grad rows are zero,
    # others unaffected (reference: base_loss.py:283-289)
    labels = jnp.asarray([[1, 2, 1], [1, 2, 1]], jnp.int32)
    logprobas = jax.nn.log_softmax(jnp.zeros((2, 2, 3)), axis=2)
    label_length = jnp.asarray([3, 1], jnp.int32)
    logit_length = jnp.asarray([2, 2], jnp.int32)

    loss = ctc_loss_from_logproba(
        labels, logprobas, label_length, logit_length, 0, topology
    )
    assert np.isposinf(np.asarray(loss)[0])
    assert np.isfinite(np.asarray(loss)[1])

    grad = jax.grad(
        lambda x: jnp.sum(
            ctc_loss_from_logproba(
                labels, x, label_length, logit_length, 0, topology
            )
        )
    )(logprobas)
    g = np.asarray(grad)
    assert np.all(g[0] == 0.0)
    assert np.any(g[1] != 0.0)


def test_gradient_accepts_cotangent_scaling(topology):
    inputs = _inputs()
    lp = inputs["logprobas"]

    def loss_weighted(x, w):
        return jnp.sum(
            w
            * ctc_loss_from_logproba(
                inputs["labels"],
                x,
                inputs["label_length"],
                inputs["logit_length"],
                0,
                topology,
            )
        )

    w = jnp.asarray([0.25, 4.0])
    grad_w = jax.grad(loss_weighted)(lp, w)
    grad_1 = ctc_loss_gradient(
        inputs["labels"],
        lp,
        inputs["label_length"],
        inputs["logit_length"],
        0,
        topology,
    )
    np.testing.assert_allclose(
        np.asarray(grad_w),
        np.asarray(grad_1) * np.asarray(w)[:, None, None],
        atol=1e-6,
    )
