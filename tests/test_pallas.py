"""Pallas kernel correctness: interpret-mode kernels vs the pure-JAX oracle.

On CPU the kernels run through the Pallas interpreter
(``CTC_TPU_PALLAS_INTERPRET``-equivalent config); on TPU the same tests
compile to Mosaic.  The pure ``lax.scan`` implementations are the oracle
(themselves pinned by the reference tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tf_seq2seq_losses_tpu.ops import classic as classic_mod
from tf_seq2seq_losses_tpu.ops import core as core_mod
from tf_seq2seq_losses_tpu.ops import pallas_lattice as pk
from tf_seq2seq_losses_tpu.ops import simplified as simplified_mod
from tf_seq2seq_losses_tpu.utils.config import config_override


def _ctx(batch=4, max_t=9, vocab=5, seed=0):
    inputs = generate_ctc_loss_inputs(
        batch_size=batch,
        max_logit_length=max_t,
        random_seed=seed,
        num_tokens=vocab,
        blank_index=0,
    )
    return core_mod.make_context(
        inputs["labels"],
        inputs["logprobas"],
        inputs["label_length"],
        inputs["logit_length"],
        0,
    )


@pytest.fixture(autouse=True)
def interpret_mode():
    with config_override(use_pallas=True, interpret=True, block_batch=2, block_time=4):
        yield


def test_classic_alpha_matches_pure():
    ctx = _ctx()
    np.testing.assert_allclose(
        np.asarray(pk.classic_alpha(ctx)),
        np.asarray(classic_mod.alpha(ctx)),
        atol=1e-5,
    )


def test_classic_alpha_final_matches_loss():
    ctx = _ctx(batch=3, max_t=7)
    final = pk.classic_alpha_final(ctx)
    # forced-blank padding merges states but preserves logsumexp over states
    loss_fast = classic_mod.loss(ctx, final[:, None])
    loss_ref = classic_mod.loss(ctx, classic_mod.alpha(ctx))
    np.testing.assert_allclose(
        np.asarray(loss_fast), np.asarray(loss_ref), atol=1e-5
    )


def test_classic_beta_matches_pure():
    ctx = _ctx(batch=2, max_t=11)
    np.testing.assert_allclose(
        np.asarray(pk.classic_beta(ctx)),
        np.asarray(classic_mod.beta(ctx)),
        atol=1e-5,
    )


def test_simplified_alpha_beta_match_pure():
    ctx = _ctx(batch=3, max_t=10)
    np.testing.assert_allclose(
        np.asarray(pk.simplified_alpha(ctx)),
        np.asarray(simplified_mod.alpha(ctx)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(pk.simplified_beta(ctx)),
        np.asarray(simplified_mod.beta(ctx)),
        atol=1e-5,
    )
    final = pk.simplified_alpha_final(ctx)
    np.testing.assert_allclose(
        np.asarray(final),
        np.asarray(simplified_mod.alpha(ctx))[:, -1],
        atol=1e-5,
    )


def test_infeasible_and_saturated_through_kernels():
    # +inf loss and saturated logits survive the kernel path
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    labels = jnp.asarray([[1, 1]], jnp.int32)
    logits = jnp.zeros((1, 2, 3), jnp.float32)
    loss = classic_ctc_loss(
        labels, logits, jnp.asarray([2]), jnp.asarray([2]), 0
    )
    assert np.isposinf(np.asarray(loss)[0])

    logits = jnp.asarray([[[1e10, 0.0, 0.0]]], jnp.float32)
    loss = classic_ctc_loss(
        jnp.asarray([[1]], jnp.int32),
        logits,
        jnp.asarray([1]),
        jnp.asarray([1]),
        0,
    )
    assert float(loss[0]) == 1e10


def test_full_chain_grad_through_kernels():
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    inputs = generate_ctc_loss_inputs(
        batch_size=3, max_logit_length=6, random_seed=0, num_tokens=4, blank_index=0
    )

    def loss_sum(x):
        return jnp.sum(
            classic_ctc_loss(
                inputs["labels"], x, inputs["label_length"], inputs["logit_length"], 0
            )
        )

    g_pallas = jax.grad(loss_sum)(inputs["logits"])
    with config_override(use_pallas=False):
        g_pure = jax.grad(loss_sum)(inputs["logits"])
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_pure), atol=1e-5)
