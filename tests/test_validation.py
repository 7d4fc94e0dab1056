"""Loud-failure contract: dtype validation and shape-dynamic helpers.

Reference: ``_verify_inputs`` (base_loss.py:129-138) rejects wrong dtypes
instead of silently casting (a float label would otherwise truncate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu.api import classic_ctc_loss
from tf_seq2seq_losses_tpu.ops.core import make_context
from tf_seq2seq_losses_tpu.utils.numerics import insert_zeros


def _inputs():
    rng = np.random.RandomState(0)
    return dict(
        labels=jnp.asarray(rng.randint(1, 4, (2, 3)).astype(np.int32)),
        logprobas=jnp.asarray(rng.randn(2, 5, 4).astype(np.float32)),
        label_length=jnp.asarray([2, 3], dtype=jnp.int32),
        logit_length=jnp.asarray([5, 4], dtype=jnp.int32),
    )


def test_float_labels_rejected():
    kw = _inputs()
    with pytest.raises(TypeError, match="labels must be integer"):
        make_context(
            kw["labels"].astype(jnp.float32), kw["logprobas"],
            kw["label_length"], kw["logit_length"], 0,
        )


def test_float_lengths_rejected():
    kw = _inputs()
    with pytest.raises(TypeError, match="label_length must be integer"):
        make_context(
            kw["labels"], kw["logprobas"],
            kw["label_length"].astype(jnp.float32), kw["logit_length"], 0,
        )
    with pytest.raises(TypeError, match="logit_length must be integer"):
        make_context(
            kw["labels"], kw["logprobas"],
            kw["label_length"], kw["logit_length"].astype(jnp.bfloat16), 0,
        )


def test_integer_logits_rejected():
    kw = _inputs()
    with pytest.raises(TypeError, match="floating point"):
        make_context(
            kw["labels"], kw["logprobas"].astype(jnp.int32),
            kw["label_length"], kw["logit_length"], 0,
        )


def test_valid_dtypes_still_accepted_under_jit():
    kw = _inputs()
    loss = jax.jit(classic_ctc_loss)(
        kw["labels"], kw["logprobas"], kw["label_length"], kw["logit_length"]
    )
    assert np.isfinite(np.asarray(loss)).all()


def test_insert_zeros_loud_error_under_jit():
    tensor = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    mask = jnp.asarray([[False, True, True]])
    # eager path still works (reference docstring example, tools.py:151-188)
    out = insert_zeros(tensor, mask)
    np.testing.assert_array_equal(np.asarray(out), [[1, 0, 2, 0, 3]])
    with pytest.raises(ValueError, match="data-dependent output width"):
        jax.jit(insert_zeros)(tensor, mask)
