"""Parity against committed golden tensors (VERDICT r3 next #8).

``tests/golden/golden_enum.npz`` is generated once by
``tests/golden/make_golden.py --source enum`` (the float64 O(V^T)
all-alignments oracle — independent of every library code path) and
committed, so this test is a *pinned-artifact* regression check: fast (no
enumeration at runtime), dependency-free (no torch/optax), and immune to
accidental co-evolution of library and oracle code.

If ``golden_tf.npz`` exists (produced off-box from the actual TF reference
binary — see make_golden.py ``--source tf``), it is checked too: the
golden ``lp`` inputs are already log-softmax-normalised, so feeding them
to the reference's *logits* entry yields the same loss as the
from-logproba semantics, while its gradient goes through the softmax —
compared against this library's logits entry.

Reference analogue: the pinned constants in
/root/reference/tests/common.py:25-50.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss
from tf_seq2seq_losses_tpu.api import (
    ctc_loss_from_logproba,
    ctc_loss_gradient,
    ctc_loss_hessian,
)

_GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    path = os.path.join(_GOLDEN_DIR, name)
    if not os.path.exists(path):
        return None
    data = np.load(path)
    cases = {}
    for key in data.files:
        case, field = key.split("/", 1)
        cases.setdefault(case, {})[field] = data[key]
    return [cases[k] for k in sorted(cases)]


_ENUM = _load("golden_enum.npz")
_TF = _load("golden_tf.npz")


@pytest.mark.parametrize("idx", range(len(_ENUM) if _ENUM else 0))
def test_matches_enum_goldens(idx):
    c = _ENUM[idx]
    topology = c["topology"].item().decode()
    blank = int(c["blank"])
    args = (
        jnp.asarray(c["labels"]), jnp.asarray(c["lp"]),
        jnp.asarray(c["label_len"]), jnp.asarray(c["logit_len"]),
    )
    loss = np.asarray(
        ctc_loss_from_logproba(*args[:2], *args[2:], blank, topology)
    )
    finite = np.isfinite(c["loss"])
    np.testing.assert_allclose(
        loss[finite], c["loss"][finite], rtol=1e-5, atol=1e-5
    )
    assert np.isposinf(loss[~finite]).all()

    grad = np.asarray(
        ctc_loss_gradient(*args[:2], *args[2:], blank, topology)
    )
    np.testing.assert_allclose(grad, c["grad"], rtol=1e-4, atol=1e-5)

    hess = np.asarray(
        ctc_loss_hessian(*args[:2], *args[2:], blank, topology)
    )
    np.testing.assert_allclose(hess, c["hessian"], atol=1e-4)


@pytest.mark.parametrize("idx", range(len(_TF) if _TF else 0))
def test_matches_tf_reference_goldens(idx):
    c = _TF[idx]
    topology = c["topology"].item().decode()
    blank = int(c["blank"])
    fn = classic_ctc_loss if topology == "classic" else simplified_ctc_loss
    labels = jnp.asarray(c["labels"])
    logits = jnp.asarray(c["lp"])  # normalised: log_softmax is identity
    ll, gl = jnp.asarray(c["label_len"]), jnp.asarray(c["logit_len"])

    loss = np.asarray(fn(labels, logits, ll, gl, blank))
    finite = np.isfinite(c["loss"])
    np.testing.assert_allclose(
        loss[finite], c["loss"][finite], rtol=1e-5, atol=1e-5
    )

    grad = np.asarray(
        jax.grad(lambda x: jnp.sum(jnp.where(
            jnp.isfinite(fn(labels, x, ll, gl, blank)),
            fn(labels, x, ll, gl, blank), 0.0,
        )))(logits)
    )
    np.testing.assert_allclose(grad, c["grad"], rtol=1e-4, atol=1e-5)
