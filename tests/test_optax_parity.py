"""Cross-implementation parity against optax.ctc_loss.

A second independent oracle for the classic (Graves) topology, alongside the
torch check (tests/test_torch_parity.py) — the reference's analogue is its
``tf.nn.ctc_loss`` parity suite (tests/test_classic_ctc_loss.py:332-393).
optax is also the stock-JAX baseline the benchmark harness compares against
(benchmarks/benchmark.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

optax = pytest.importorskip("optax")

from tests.conftest import generate_ctc_loss_inputs  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402


def _optax_loss(inputs):
    logits = inputs["logits"]
    max_t = logits.shape[1]
    max_l = inputs["labels"].shape[1]
    logit_paddings = (
        jnp.arange(max_t)[None, :] >= inputs["logit_length"][:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(max_l)[None, :] >= inputs["label_length"][:, None]
    ).astype(jnp.float32)

    def fn(x):
        return optax.ctc_loss(
            x, logit_paddings, inputs["labels"], label_paddings, blank_id=0
        )

    return fn


def test_forward_matches_optax():
    inputs = generate_ctc_loss_inputs(
        batch_size=8, max_logit_length=20, random_seed=3, num_tokens=8, blank_index=0
    )
    ref = _optax_loss(inputs)(inputs["logits"])
    ours = classic_ctc_loss(
        inputs["labels"],
        inputs["logits"],
        inputs["label_length"],
        inputs["logit_length"],
        0,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_gradient_matches_optax():
    inputs = generate_ctc_loss_inputs(
        batch_size=4, max_logit_length=32, random_seed=4, num_tokens=6, blank_index=0
    )
    ref_grad = jax.grad(lambda x: jnp.sum(_optax_loss(inputs)(x)))(inputs["logits"])
    ours = jax.grad(
        lambda x: jnp.sum(
            classic_ctc_loss(
                inputs["labels"],
                x,
                inputs["label_length"],
                inputs["logit_length"],
                0,
            )
        )
    )(inputs["logits"])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_grad), atol=1e-4)
