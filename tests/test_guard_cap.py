"""Saturation-guard behaviour past the HBM fallback cap (ADVICE r2 medium /
VERDICT r2 next-round #4).

The cap (``CTC_TPU_GUARD_FALLBACK_BYTES``) normally only bites at very long
sequences (B=256, T=4000); these tests shrink it so the above-cap contract is
pinned at toy shapes:

* full batch over the cap, bucket under it -> the gather repair still runs
  and flushed feasible samples come out exact (the reference's unconditional
  stability guarantee, README.md:74-78, survives the cap);
* even the bucket over the cap -> the guard is dropped with a loud
  trace-time warning and flushed samples keep the +inf fast value.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu.utils.config import config_override


@pytest.fixture(autouse=True)
def interpret_mode():
    with config_override(
        use_pallas=True, interpret=True, block_batch=2, block_time=4
    ):
        yield


def _saturated_batch():
    """6-sample batch, sample 2 feasible-but-f32-saturated (wrong certain
    prediction: posterior underflows probability space)."""
    rand = np.random.RandomState(0)
    batch, max_t, vocab, max_l = 6, 12, 5, 5
    logits = rand.randn(batch, max_t, vocab).astype(np.float32)
    logits[2] = 0.0
    logits[2, :, 2] = 100.0
    labels = rand.randint(1, vocab, (batch, max_l)).astype(np.int32)
    labels[2, 0] = 1
    ll = np.full((batch,), 3, np.int32)
    ll[2] = 1
    gl = np.full((batch,), max_t, np.int32)
    return (jnp.asarray(labels), jnp.asarray(logits), jnp.asarray(ll),
            jnp.asarray(gl))


def _est(batch, max_t, lp1):
    return batch * (max_t + 1) * lp1 * 4 * 8


@pytest.mark.parametrize("struct", ["while", "cond"])
def test_gather_repair_survives_above_cap(monkeypatch, struct):
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    args = _saturated_batch()
    lp1 = args[0].shape[1] + 1
    # cap between the bucket's and the full batch's working set
    cap = (_est(2, 12, lp1) + _est(6, 12, lp1)) // 2
    with config_override(use_pallas=False):
        want = classic_ctc_loss(*args, 0)
    monkeypatch.setenv("CTC_TPU_GUARD_FALLBACK_BYTES", str(cap))
    with config_override(repair_bucket=2, guard_struct=struct):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = classic_ctc_loss(*args, 0)
        if struct == "cond":
            # the cond struct degrades above the cap (whole-batch branch
            # dropped) and says so; the while struct's bounded repair
            # rounds have no whole-batch branch to drop — no warning.
            assert any(
                "whole-batch exact reroute disabled" in str(w.message)
                for w in caught
            )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_guard_dropped_with_warning_when_nothing_fits(monkeypatch):
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    args = _saturated_batch()
    monkeypatch.setenv("CTC_TPU_GUARD_FALLBACK_BYTES", "1")
    with config_override(repair_bucket=2):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = classic_ctc_loss(*args, 0)
        assert any(
            "saturation guard disabled" in str(w.message) for w in caught
        )
    # sample 2 keeps the flushed +inf fast value; the sane samples are fine
    got = np.asarray(got)
    assert np.isposinf(got[2])
    finite_idx = [0, 1, 3, 4, 5]
    assert np.isfinite(got[finite_idx]).all()


@pytest.mark.slow
def test_gradient_repair_above_cap(monkeypatch):
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    args = _saturated_batch()
    lp1 = args[0].shape[1] + 1
    cap = (_est(2, 12, lp1) + _est(6, 12, lp1)) // 2

    def scalar(x):
        out = classic_ctc_loss(args[0], x, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    with config_override(use_pallas=False):
        g_want = jax.grad(scalar)(args[1])
    monkeypatch.setenv("CTC_TPU_GUARD_FALLBACK_BYTES", str(cap))
    with config_override(repair_bucket=2):
        g_got = jax.grad(scalar)(args[1])
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)


# Heavy-module compiled-state bound (see tests/conftest.py
# bound_compiled_state_fixture docstring: jaxlib 0.9.0 segfault).
from tests.conftest import bound_compiled_state_fixture

_bound_compiled_state = bound_compiled_state_fixture()
