"""While-struct saturation guard (``config.guard_struct = "while"``).

The r5b escalation restructure: instead of the tiered ``lax.cond`` lattice
(whose whole-tensor conditionals cost +0.14 ms at V=32 / +0.82 ms at V=128
on every CLEAN step — benchmarks/r5_guard.py, chip), the escalation is a
``lax.while_loop`` of gathered exact-kernel repair rounds that takes zero
trips on a clean batch.  Contract differences vs "cond", pinned here:

* identical repaired values for every flushed row (same exact math);
* clean rows ALWAYS keep their fast values (the cond struct's > bucket2
  whole-batch reroute replaced clean rows with exact values — both within
  tolerance of the pure oracle);
* coverage is strictly wider: all flushed rows are repaired in bounded
  O(bucket2*T*L) memory, including above the HBM cap and beyond bucket2;
* ``guard_tier1=False`` drops the tier-1 small cond: rounds handle every
  n > 0 (cleanest clean path, n=1 pays one full exact round).

Full cross-product evidence: tests/test_guard_sweep.py run under
``CTC_TPU_GUARD_STRUCT=while`` (driver log).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override

BATCH, MAX_T, VOCAB = 8, 6, 4


@pytest.fixture(autouse=True)
def interpret_mode():
    with config_override(
        use_pallas=True, interpret=True, block_batch=2, block_time=4,
        repair_bucket=2, repair_bucket2=4, log_fallback=True,
        sort_by_length=False,
    ):
        yield


def _batch(n_flushed):
    rand = np.random.RandomState(7)
    logits = rand.randn(BATCH, MAX_T, VOCAB).astype(np.float32)
    logits[:n_flushed] = 0.0
    logits[:n_flushed, :, VOCAB - 1] = 100.0
    labels = np.tile(np.array([[1, 2]], np.int32), (BATCH, 1))
    return (
        jnp.asarray(labels),
        jnp.asarray(logits),
        jnp.full((BATCH,), 2, jnp.int32),
        jnp.full((BATCH,), MAX_T, jnp.int32),
    )


def _scalar(args):
    def scalar(x):
        out = classic_ctc_loss(args[0], x, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    return scalar


# n spans: clean, tier-1, == bucket, tier-2 rounds, > bucket2 (2 rounds),
# whole batch.  tier1=False cells assert the same lattice with the tier-1
# cond removed; the fast tier (tier1=True) covers every structural branch
# the False cells reach except skipping the small cond, so False rides
# the slow suite.
@pytest.mark.parametrize("n_flushed", [0, 1, 2, 3, 5, 8])
@pytest.mark.parametrize(
    "tier1",
    [
        True,
        pytest.param(False, marks=pytest.mark.slow),
    ],
)
def test_while_struct_matches_pure(n_flushed, tier1):
    args = _batch(n_flushed)
    scalar = _scalar(args)
    with config_override(use_pallas=False):
        want = np.asarray(classic_ctc_loss(*args, 0))
        g_want = np.asarray(jax.grad(scalar)(args[1]))
    with config_override(guard_struct="while", guard_tier1=tier1):
        got = np.asarray(classic_ctc_loss(*args, 0))
        g_got = np.asarray(jax.grad(scalar)(args[1]))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(g_got, g_want, atol=1e-4)


def test_while_struct_repairs_above_cap(monkeypatch):
    """All 5 flushed rows repaired even when the cap only admits the
    bucket2-round working set (the cond struct leaves row 5 at +inf)."""
    from tf_seq2seq_losses_tpu.ops import core as core_mod
    from tf_seq2seq_losses_tpu.ops.topology import _est_fallback_bytes

    args = _batch(5)
    ctx = core_mod.make_context(args[0], args[1], args[2], args[3], 0)
    cap = _est_fallback_bytes(
        4, MAX_T, ctx.label.shape[1], lane_pad=True
    )
    monkeypatch.setenv("CTC_TPU_GUARD_FALLBACK_BYTES", str(cap))
    with config_override(use_pallas=False):
        want = np.asarray(classic_ctc_loss(*args, 0))
    with config_override(guard_struct="while"):
        got = np.asarray(classic_ctc_loss(*args, 0))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_structs_agree_on_repaired_rows():
    """cond and while produce identical values for flushed rows and
    tolerance-identical values for clean rows (n <= bucket2: both structs
    leave clean rows on the fast path, so equality is exact)."""
    args = _batch(3)
    scalar = _scalar(args)
    with config_override(guard_struct="cond"):
        loss_c = np.asarray(classic_ctc_loss(*args, 0))
        g_c = np.asarray(jax.grad(scalar)(args[1]))
    with config_override(guard_struct="while"):
        loss_w = np.asarray(classic_ctc_loss(*args, 0))
        g_w = np.asarray(jax.grad(scalar)(args[1]))
    np.testing.assert_allclose(loss_w, loss_c, rtol=1e-6)
    np.testing.assert_allclose(g_w, g_c, atol=1e-6)


# Heavy-module compiled-state bound (see tests/conftest.py
# bound_compiled_state_fixture docstring: jaxlib 0.9.0 segfault).
from tests.conftest import bound_compiled_state_fixture

_bound_compiled_state = bound_compiled_state_fixture()
