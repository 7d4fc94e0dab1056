"""Logits-level fused VJP (autodiff level 0).

``ctc_loss`` fuses the log-softmax VJP analytically via the posterior
identity (every valid frame's gradient row sums to exactly -1):
``d_logits = d_loss * (grad_logproba + softmax * mask)``.  These tests pin
it against the generic route (logproba-level chain + JAX autodiff through
``logit_to_logproba``) for gradients AND Hessians, on both paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tf_seq2seq_losses_tpu import classic_ctc_loss, ctc_loss_from_logproba
from tf_seq2seq_losses_tpu.utils.config import config_override
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba


def _args(seed=0):
    inputs = generate_ctc_loss_inputs(
        batch_size=4, max_logit_length=9, random_seed=seed, num_tokens=5,
        blank_index=0,
    )
    return (inputs["labels"], inputs["logits"], inputs["label_length"],
            inputs["logit_length"])


def _scalars(args, topology="classic"):
    def fused(x):
        out = classic_ctc_loss(args[0], x, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    def generic(x):
        out = ctc_loss_from_logproba(
            args[0], logit_to_logproba(x, 2), args[2], args[3], 0, topology
        )
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    return fused, generic


def test_fused_logits_grad_matches_generic_pure():
    args = _args()
    fused, generic = _scalars(args)
    with config_override(use_pallas=False):
        g_f = jax.grad(fused)(args[1])
        g_g = jax.grad(generic)(args[1])
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_g), atol=1e-6)


def test_fused_logits_grad_matches_generic_kernels():
    args = _args(seed=2)
    fused, generic = _scalars(args)
    with config_override(use_pallas=False):
        g_g = jax.grad(generic)(args[1])
    with config_override(
        use_pallas=True, interpret=True, block_batch=2, block_time=4
    ):
        g_f = jax.grad(fused)(args[1])
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_g), atol=2e-5)


def test_fused_logits_hessian_matches_generic():
    labels = jnp.array([[1, 2, 2, 1], [1, 2, 1, 0]], jnp.int32)
    logits = jnp.asarray(
        np.random.RandomState(0).randn(2, 5, 3).astype(np.float32)
    )
    ll, gl = jnp.array([4, 3]), jnp.array([5, 4])

    def f_fused(x):
        return jnp.sum(classic_ctc_loss(labels, x, ll, gl, 0))

    def f_gen(x):
        return jnp.sum(
            ctc_loss_from_logproba(labels, logit_to_logproba(x, 2), ll, gl, 0)
        )

    h_f = jax.jacrev(jax.grad(f_fused))(logits)
    h_g = jax.jacrev(jax.grad(f_gen))(logits)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_g), atol=1e-5)

    with pytest.raises(NotImplementedError):
        jax.jacrev(lambda x: jax.jacrev(jax.grad(f_fused))(x))(logits)


def test_fused_logits_infeasible_zero_grad():
    labels = jnp.array([[1, 2, 2, 1], [1, 2, 1, 0]], jnp.int32)
    ll, gl = jnp.array([4, 3]), jnp.array([2, 2])

    def f(x):
        out = classic_ctc_loss(labels, x, ll, gl, 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    g = jax.grad(f)(jnp.zeros((2, 2, 3)))
    assert (np.asarray(g) == 0).all()


@pytest.mark.slow
def test_kernel_path_hessian_both_levels():
    """jacrev^2 must work with the Pallas path ON (latent r2 bug: the fwd
    rules built kernel contexts on differentiable inputs, so second-order
    differentiation tried to linearise pallas_call, which has no jvp rule;
    the reference's own stop_gradient-the-inputs trick, base_loss.py:91-97,
    is the fix)."""
    labels = jnp.array([[1, 2, 2, 1], [1, 2, 1, 0]], jnp.int32)
    logits = jnp.asarray(
        np.random.RandomState(0).randn(2, 5, 3).astype(np.float32)
    )
    lp = logit_to_logproba(logits, 2)
    ll, gl = jnp.array([4, 3]), jnp.array([5, 4])

    def f_lp(x):
        return jnp.sum(ctc_loss_from_logproba(labels, x, ll, gl, 0))

    def f_logits(x):
        return jnp.sum(classic_ctc_loss(labels, x, ll, gl, 0))

    h_lp_ref = jax.jacrev(jax.grad(f_lp))(lp)
    h_lg_ref = jax.jacrev(jax.grad(f_logits))(logits)
    with config_override(
        use_pallas=True, interpret=True, block_batch=2, block_time=4
    ):
        h_lp = jax.jacrev(jax.grad(f_lp))(lp)
        h_lg = jax.jit(jax.jacrev(jax.grad(f_logits)))(logits)
    np.testing.assert_allclose(np.asarray(h_lp), np.asarray(h_lp_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_lg), np.asarray(h_lg_ref), atol=1e-4)
