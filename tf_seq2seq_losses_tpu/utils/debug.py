"""Debugging guards: checkify-instrumented loss entry points.

The reference has no sanitizers (SURVEY §5) — its defence is input asserts
and the guarantee that bad inputs yield ``+inf`` loss rather than NaN.  The
JAX-native extra layer offered here is `jax.experimental.checkify`: a wrapped
loss that *errors loudly* (instead of silently propagating) when

* inputs contain NaN, or
* the computed loss is NaN (which the library's contracts rule out — a NaN
  here means a genuine bug or corrupted input), or
* a negative loss appears (impossible: losses are -log probabilities).

Use in tests/debug sessions; the production path stays uninstrumented.
Pallas kernel debugging uses interpret mode instead
(``config_override(interpret=True)`` or ``CTC_TPU_PALLAS_INTERPRET=1``),
which runs the kernels as plain numpy-like JAX on any backend.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import checkify

from tf_seq2seq_losses_tpu import api


def checked_ctc_loss(
    labels,
    logits,
    label_length,
    logit_length,
    blank_index=0,
    topology: str = "classic",
):
    """CTC loss with runtime validity checks.

    Returns ``(error, loss)`` following the checkify convention; call
    ``error.throw()`` to raise on failure.
    """

    def fn(labels, logits, label_length, logit_length):
        checkify.check(
            ~jnp.any(jnp.isnan(logits)), "NaN in logits"
        )
        checkify.check(
            jnp.all(label_length >= 0) & jnp.all(logit_length >= 0),
            "negative length",
        )
        loss = api.ctc_loss(
            labels, logits, label_length, logit_length, blank_index, topology
        )
        checkify.check(~jnp.any(jnp.isnan(loss)), "NaN loss (library bug?)")
        checkify.check(
            jnp.all(loss >= -1e-4), "negative loss (library bug?)"
        )
        return loss

    checked = checkify.checkify(fn)
    return checked(labels, logits, label_length, logit_length)
