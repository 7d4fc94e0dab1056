"""Toolkit unit tests, ported from the reference's tests/test_tools.py."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.finite_difference import finite_difference_batch_jacobian
from tf_seq2seq_losses_tpu.utils import numerics as nm


def test_logit_to_logproba_matches_log_softmax():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5).astype(np.float32))
    out = nm.logit_to_logproba(x, axis=2)
    expected = jax.nn.log_softmax(x, axis=2)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_logit_to_logproba_saturated():
    x = jnp.asarray([[1e10, 0.0, 0.0]], dtype=jnp.float32)
    out = np.asarray(nm.logit_to_logproba(x, axis=1))
    assert out[0, 0] == 0.0
    assert np.all(out[0, 1:] == -1e10)


def test_logsumexp_basic():
    # reference: test_tools.py:34-51
    assert np.isclose(
        nm.logsumexp(jnp.float32(0.0), jnp.float32(0.0)), np.log(2.0)
    )
    assert nm.logsumexp(jnp.float32(-np.inf), jnp.float32(-np.inf)) == -np.inf
    assert nm.logsumexp(jnp.float32(0.0), jnp.float32(-np.inf)) == 0.0
    assert nm.logsumexp(jnp.float32(-np.inf), jnp.float32(0.0)) == 0.0
    # extreme magnitudes stay finite and ordered
    big = nm.logsumexp(jnp.float32(-1e12), jnp.float32(0.0))
    assert float(big) == 0.0


def test_logsumexp_positive_infinities():
    # +inf ties returned NaN (inf - inf in the diff) before the r3 fix;
    # jnp.logaddexp's contract is +inf throughout
    assert nm.logsumexp(jnp.float32(np.inf), jnp.float32(np.inf)) == np.inf
    assert nm.logsumexp(jnp.float32(np.inf), jnp.float32(3.0)) == np.inf
    assert nm.logsumexp(jnp.float32(3.0), jnp.float32(np.inf)) == np.inf
    assert nm.logsumexp(jnp.float32(np.inf), jnp.float32(-np.inf)) == np.inf
    assert nm.logsumexp(jnp.float32(-np.inf), jnp.float32(np.inf)) == np.inf


def test_subexp():
    x = jnp.asarray([1.0, 2.0, -np.inf, 3.0], dtype=jnp.float32)
    y = jnp.asarray([0.5, 2.0, -np.inf, 5.0], dtype=jnp.float32)
    out = np.asarray(nm.subexp(x, y))
    expected = np.exp(np.asarray(x)) - np.exp(np.asarray(y))
    expected[2] = 0.0
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_unsorted_segment_logsumexp():
    # reference: test_tools.py:137-148 — -inf members and empty segments
    data = jnp.asarray([0.0, 0.0, -np.inf, 1.0], dtype=jnp.float32)
    seg = jnp.asarray([0, 0, 1, 1])
    out = np.asarray(nm.unsorted_segment_logsumexp(data, seg, 3))
    np.testing.assert_allclose(out[0], np.log(2.0), atol=1e-6)
    np.testing.assert_allclose(out[1], 1.0, atol=1e-6)
    assert out[2] == -np.inf


def test_pad_until():
    x = jnp.ones((2, 3))
    out = nm.pad_until(x, 5, axis=1, pad_value=7.0)
    assert out.shape == (2, 5)
    assert np.all(np.asarray(out)[:, 3:] == 7.0)


def test_insert_zeros():
    # reference docstring example: tools.py:154-162
    tensor = jnp.asarray([[1, 2, 3, 4, 5], [10, 20, 30, 40, 50]], dtype=jnp.int32)
    mask = jnp.asarray(
        [[False, True, False, False, True], [False, True, True, True, False]]
    )
    out = np.asarray(nm.insert_zeros(tensor, mask))
    expected = np.array(
        [[1, 0, 2, 3, 4, 0, 5, 0], [10, 0, 20, 0, 30, 0, 40, 50]], dtype=np.int32
    )
    np.testing.assert_array_equal(out, expected)


def test_unfold_forward():
    # reference docstring example: tools.py:216-225
    out = nm.unfold(
        init_tensor=jnp.asarray(0, dtype=jnp.int32),
        iterfunc=lambda x, i: x + i,
        num_iters=5,
        d_i=1,
    )
    np.testing.assert_array_equal(np.asarray(out), [0, 0, 1, 3, 6, 10])


def test_unfold_backward():
    out = nm.unfold(
        init_tensor=jnp.asarray(0, dtype=jnp.int32),
        iterfunc=lambda x, i: x + i,
        num_iters=3,
        d_i=-1,
    )
    # index i holds the value after consuming steps i..2:
    # [0+2+1+0, 0+2+1, 0+2, 0]
    np.testing.assert_array_equal(np.asarray(out), [3, 3, 2, 0])


def test_reduce_max_with_default():
    assert nm.reduce_max_with_default(jnp.asarray([1, 5, 2]), 0) == 5
    assert nm.reduce_max_with_default(jnp.asarray([], dtype=jnp.int32), 7) == 7


def test_expand_many_dims():
    out = nm.expand_many_dims(jnp.zeros((5, 1, 3)), axes=[0, 4, 5])
    assert out.shape == (1, 5, 1, 3, 1, 1)


def test_smart_transpose():
    out = nm.smart_transpose(jnp.zeros((2, 3, 4, 5, 6)), [2, 1, 0])
    assert out.shape == (4, 3, 2, 5, 6)


def test_smart_reshape():
    out = nm.smart_reshape(jnp.zeros((2, 3, 4, 5)), [8, None, 1])
    assert out.shape == (8, 3, 1, 5)


def test_finite_difference_self_check():
    # reference: finite_difference.py docstring example
    x = jnp.ones((2, 3, 4))
    func = lambda t: jnp.sum(t**2, axis=(1, 2)) / 2  # noqa: E731
    jac = finite_difference_batch_jacobian(func, x, epsilon=1e-3)
    assert jac.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(jac), np.ones((2, 3, 4)), atol=1e-2)


def test_checked_ctc_loss_passes_and_catches_nan():
    import jax.numpy as jnp

    from tf_seq2seq_losses_tpu.utils.debug import checked_ctc_loss

    labels = jnp.asarray([[1, 2]], jnp.int32)
    logits = jnp.zeros((1, 4, 3), jnp.float32)
    err, loss = checked_ctc_loss(
        labels, logits, jnp.asarray([2]), jnp.asarray([4])
    )
    err.throw()  # no error
    assert np.isfinite(np.asarray(loss)).all()

    bad = logits.at[0, 0, 0].set(jnp.nan)
    err, _ = checked_ctc_loss(labels, bad, jnp.asarray([2]), jnp.asarray([4]))
    try:
        err.throw()
        raise AssertionError("expected checkify error")
    except Exception as e:  # JaxRuntimeError
        assert "NaN in logits" in str(e)


def test_profiling_annotate_and_block_ms():
    import jax.numpy as jnp

    from tf_seq2seq_losses_tpu.utils.profiling import annotate, block_ms

    with annotate("test_region"):
        x = jnp.ones((4, 4)) * 2.0
    ms = block_ms(lambda: jnp.sum(x), iters=2)
    assert ms >= 0.0
