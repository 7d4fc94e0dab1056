"""O(T)-memory Hessian-vector product (api.ctc_loss_hessian_vector_product).

Forward-mode over the analytic gradient recursions; must equal the full
Hessian contraction exactly (small shapes) and the central finite
difference of the analytic gradient (moderate shapes where the full
Hessian is already infeasible to materialise comfortably).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tf_seq2seq_losses_tpu import (
    ctc_loss_gradient,
    ctc_loss_hessian,
    ctc_loss_hessian_vector_product,
)


def _inputs(batch, max_t, vocab, seed):
    inputs = generate_ctc_loss_inputs(
        batch_size=batch, max_logit_length=max_t, random_seed=seed,
        num_tokens=vocab, blank_index=0,
    )
    return (inputs["labels"], inputs["logprobas"], inputs["label_length"],
            inputs["logit_length"])


@pytest.mark.parametrize("topology", ["classic", "simplified"])
def test_hvp_matches_full_hessian_contraction(topology):
    labels, lp, ll, gl = _inputs(2, 5, 3, 11)
    v = jnp.asarray(
        np.random.RandomState(1).randn(*lp.shape).astype(np.float32)
    )
    hess = ctc_loss_hessian(labels, lp, ll, gl, 0, topology)
    want = jnp.einsum("btvxy,bxy->btv", hess, v)
    got = ctc_loss_hessian_vector_product(labels, lp, ll, gl, 0, v, topology)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_hvp_accepts_reduced_precision_and_validates_shape():
    # bfloat16 logprobas are accepted everywhere else in the api; jax.jvp
    # demands equal primal/tangent dtypes, so the entry must cast both
    labels, lp, ll, gl = _inputs(2, 5, 3, 11)
    v = jnp.asarray(
        np.random.RandomState(1).randn(*lp.shape).astype(np.float32)
    )
    want = ctc_loss_hessian_vector_product(labels, lp, ll, gl, 0, v)
    got = ctc_loss_hessian_vector_product(
        labels, lp.astype(jnp.bfloat16), ll, gl, 0, v
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-2)
    with pytest.raises(ValueError, match="vector must match"):
        ctc_loss_hessian_vector_product(labels, lp, ll, gl, 0, v[:, :-1])


@pytest.mark.slow
def test_hvp_matches_grad_finite_difference_at_scale():
    # T=24: the full Hessian would be [3, 24, 6, 24, 6]; the HVP needs only
    # first-order memory.  Central difference of the analytic gradient is
    # an O(T)-memory oracle.
    labels, lp, ll, gl = _inputs(3, 24, 6, 5)
    v = jnp.asarray(
        np.random.RandomState(2).randn(*lp.shape).astype(np.float32)
    )
    eps = 1e-3
    g_plus = ctc_loss_gradient(labels, lp + eps * v, ll, gl, 0)
    g_minus = ctc_loss_gradient(labels, lp - eps * v, ll, gl, 0)
    want = (np.asarray(g_plus) - np.asarray(g_minus)) / (2 * eps)
    got = ctc_loss_hessian_vector_product(labels, lp, ll, gl, 0, v)
    # atol bounded by the f32 central-difference oracle itself (rounding/eps
    # + eps^2 truncation), not by the HVP
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


def test_hvp_zero_for_infeasible_samples():
    labels = jnp.array([[1, 2, 2, 1], [1, 2, 1, 0]], jnp.int32)
    lp = jnp.zeros((2, 2, 3)) - jnp.log(3.0)
    ll, gl = jnp.array([4, 3]), jnp.array([2, 2])
    v = jnp.ones((2, 2, 3), jnp.float32)
    got = ctc_loss_hessian_vector_product(labels, lp, ll, gl, 0, v)
    assert (np.asarray(got) == 0).all()


def test_hvp_jittable():
    labels, lp, ll, gl = _inputs(2, 7, 4, 3)
    v = jnp.ones_like(lp)
    f = jax.jit(
        lambda x, u: ctc_loss_hessian_vector_product(labels, x, ll, gl, 0, u)
    )
    out = f(lp, v)
    assert np.isfinite(np.asarray(out)).all()


def test_token_posteriors_sum_to_one_on_valid_frames():
    from tf_seq2seq_losses_tpu import ctc_token_posteriors

    labels, lp, ll, gl = _inputs(3, 10, 5, 9)
    post = np.asarray(ctc_token_posteriors(labels, lp, ll, gl, 0))
    sums = post.sum(axis=2)
    t = np.arange(post.shape[1])[None, :]
    valid = t < np.asarray(gl)[:, None]
    np.testing.assert_allclose(sums[valid], 1.0, atol=1e-5)
    np.testing.assert_allclose(sums[~valid], 0.0, atol=1e-7)
    assert (post >= -1e-7).all()
