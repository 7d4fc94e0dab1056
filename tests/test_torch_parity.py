"""Cross-implementation parity against torch.nn.functional.ctc_loss.

The reference pins its classic topology against ``tf.nn.ctc_loss``
(tests/test_classic_ctc_loss.py:332-393).  TensorFlow is not in this image;
PyTorch's native CTC implements the identical Graves topology and serves as
the independent oracle for both the forward value and the gradient.

Note: torch's CTC backward folds the log-softmax VJP into its gradient (it
returns the gradient w.r.t. *logits* even though it consumes log-probs), so
gradients are compared at the logits level on both sides.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.conftest import generate_ctc_loss_inputs  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402


def _torch_loss_and_grad(inputs):
    logits = torch.from_numpy(np.asarray(inputs["logits"])).requires_grad_(True)
    log_probs = logits.log_softmax(2).transpose(0, 1)  # [T, B, V]
    loss = F.ctc_loss(
        log_probs,
        torch.from_numpy(np.asarray(inputs["labels"], dtype=np.int64)),
        torch.from_numpy(np.asarray(inputs["logit_length"], dtype=np.int64)),
        torch.from_numpy(np.asarray(inputs["label_length"], dtype=np.int64)),
        blank=0,
        reduction="none",
    )
    loss.sum().backward()
    return loss.detach().numpy(), logits.grad.numpy()


def test_forward_matches_torch():
    # reference analogue: test_classic_ctc_loss.py:332-358 (5 decimal places)
    inputs = generate_ctc_loss_inputs(
        batch_size=8, max_logit_length=20, random_seed=0, num_tokens=8, blank_index=0
    )
    torch_loss, _ = _torch_loss_and_grad(inputs)
    ours = classic_ctc_loss(
        inputs["labels"],
        inputs["logits"],
        inputs["label_length"],
        inputs["logit_length"],
        0,
    )
    np.testing.assert_allclose(np.asarray(ours), torch_loss, atol=1e-5)


@pytest.mark.slow
def test_gradient_matches_torch():
    # reference analogue: test_classic_ctc_loss.py:360-393 (4 decimal places)
    inputs = generate_ctc_loss_inputs(
        batch_size=8, max_logit_length=64, random_seed=0, num_tokens=10, blank_index=0
    )
    _, torch_grad = _torch_loss_and_grad(inputs)
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
    np.testing.assert_allclose(np.asarray(ours), torch_grad, atol=1e-4)
