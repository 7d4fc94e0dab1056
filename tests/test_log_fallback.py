"""Log-space kernel fallback (ops/log_lattice.py): exactness and guard wiring.

VERDICT r2 #3: the >bucket saturation escalation used to reroute the whole
batch through the pure ``lax.scan`` path (~8x step time); the log-space
kernels give the same answers (log-domain f32 — nothing can flush) at a few
times the fast-kernel cost.  Tolerances: random inputs match the pure oracle
to 1e-5; extreme-saturated inputs to 1e-4 (absolute rounding scales with
``|loss| * eps`` identically in both exact implementations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tf_seq2seq_losses_tpu.ops import classic as classic_mod
from tf_seq2seq_losses_tpu.ops import core as core_mod
from tf_seq2seq_losses_tpu.ops import log_lattice as lg
from tf_seq2seq_losses_tpu.ops import simplified as simplified_mod
from tf_seq2seq_losses_tpu.ops.topology import CLASSIC, SIMPLIFIED
from tf_seq2seq_losses_tpu.utils.config import config_override
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba


@pytest.fixture(autouse=True)
def interpret_mode():
    # Persistent-cache opt-out — see tests/test_guard_sweep.py::guard_config:
    # jaxlib 0.9.0 segfaults (de)serializing the whole-batch escalation
    # executables this file compiles, late in a long suite process.
    # NOTE: jax_enable_compilation_cache is latched at first use
    # (compilation_cache.is_cache_used caches its decision per process), so
    # the per-call write gate min_compile_time_secs is the working opt-out.
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        with config_override(
            use_pallas=True, interpret=True, block_batch=2, block_time=4
        ):
            yield
    finally:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old
        )


def _ctx(batch=4, max_t=9, vocab=5, seed=0):
    inputs = generate_ctc_loss_inputs(
        batch_size=batch, max_logit_length=max_t, random_seed=seed,
        num_tokens=vocab, blank_index=0,
    )
    return core_mod.make_context(
        inputs["labels"], inputs["logprobas"], inputs["label_length"],
        inputs["logit_length"], 0,
    )


def test_classic_log_kernels_match_pure():
    ctx = _ctx()
    l_ref = classic_mod.loss(ctx, classic_mod.alpha(ctx))
    np.testing.assert_allclose(
        np.asarray(lg.classic_loss_exact(ctx)), np.asarray(l_ref), atol=1e-5
    )
    gl_ref = core_mod.gradient_log(CLASSIC, ctx, l_ref)
    gl = lg.classic_gradient_log_exact(ctx)
    np.testing.assert_allclose(
        -np.exp(np.asarray(gl)), -np.exp(np.asarray(gl_ref)), atol=1e-5
    )


def test_simplified_log_kernels_match_pure():
    ctx = _ctx(batch=3, max_t=10, seed=2)
    l_ref = simplified_mod.loss(ctx, simplified_mod.alpha(ctx))
    np.testing.assert_allclose(
        np.asarray(lg.simplified_loss_exact(ctx)), np.asarray(l_ref),
        atol=1e-5,
    )
    gl_ref = core_mod.gradient_log(SIMPLIFIED, ctx, l_ref)
    gl = lg.simplified_gradient_log_exact(ctx)
    np.testing.assert_allclose(
        -np.exp(np.asarray(gl)), -np.exp(np.asarray(gl_ref)), atol=1e-5
    )


def test_log_kernels_exact_on_saturated_inputs():
    """Wrong-certain predictions (the f32-prob-flush regime): the log
    kernels must stay finite and match the pure path."""
    logits = np.zeros((4, 6, 4), np.float32)
    logits[:, :, 3] = 100.0
    labels = np.tile(np.array([[1, 2]], np.int32), (4, 1))
    ctx = core_mod.make_context(
        jnp.asarray(labels), logit_to_logproba(jnp.asarray(logits), 2),
        jnp.full((4,), 2, jnp.int32), jnp.full((4,), 6, jnp.int32), 0,
    )
    l_ref = classic_mod.loss(ctx, classic_mod.alpha(ctx))
    l_log = lg.classic_loss_exact(ctx)
    assert np.isfinite(np.asarray(l_log)).all()
    np.testing.assert_allclose(np.asarray(l_log), np.asarray(l_ref), rtol=1e-5)
    gl_ref = core_mod.gradient_log(CLASSIC, ctx, l_ref)
    gl = lg.classic_gradient_log_exact(ctx)
    np.testing.assert_allclose(
        -np.exp(np.asarray(gl)), -np.exp(np.asarray(gl_ref)), atol=1e-4
    )


@pytest.mark.slow
@pytest.mark.parametrize("topology", ["classic", "simplified"])
def test_escalation_routes_through_log_kernels(topology):
    """Every sample saturated + bucket=1 -> the >bucket branch; with
    log_fallback on, results must still match the pure reference."""
    from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss

    fn = classic_ctc_loss if topology == "classic" else simplified_ctc_loss
    batch, max_t, vocab = 4, 6, 4
    logits = np.zeros((batch, max_t, vocab), np.float32)
    logits[:, :, 3] = 100.0
    labels = np.full((batch, 2), 1, np.int32)
    labels[:, 1] = 2
    args = (jnp.asarray(labels), jnp.asarray(logits),
            jnp.full((batch,), 2, jnp.int32), jnp.full((batch,), max_t, jnp.int32))

    def scalar(x):
        out = fn(args[0], x, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    with config_override(use_pallas=False):
        want = fn(*args, 0)
        g_want = jax.grad(scalar)(args[1])
    with config_override(repair_bucket=1, log_fallback=True):
        got = fn(*args, 0)
        g_got = jax.grad(scalar)(args[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)


def _mixed_saturation_batch(n_saturated, batch=5, max_t=6, vocab=4):
    """A batch where exactly ``n_saturated`` feasible samples flush on the
    fast probability-space path (wrong-certain predictions) and the rest
    are ordinary random inputs; returns (args, pure-path loss/grad)."""
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    rand = np.random.RandomState(7)
    logits = rand.randn(batch, max_t, vocab).astype(np.float32)
    logits[:n_saturated] = 0.0
    logits[:n_saturated, :, 3] = 100.0  # certain wrong token -> flush
    labels = np.tile(np.array([[1, 2]], np.int32), (batch, 1))
    args = (
        jnp.asarray(labels),
        jnp.asarray(logits),
        jnp.full((batch,), 2, jnp.int32),
        jnp.full((batch,), max_t, jnp.int32),
    )

    def scalar(x):
        out = classic_ctc_loss(args[0], x, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    with config_override(use_pallas=False):
        want = classic_ctc_loss(*args, 0)
        g_want = jax.grad(scalar)(args[1])
    return args, scalar, want, g_want


@pytest.mark.parametrize(
    "n_saturated", [pytest.param(2, marks=pytest.mark.slow), 4]
)
def test_tiered_escalation_matches_pure(n_saturated):
    """Tier-2 gathered log-kernel repair (bucket < n <= bucket2) and the
    whole-batch reroute beyond it (n > bucket2) both reproduce the pure
    reference, for the loss and the [B, T, V] gradient (scatter form)."""
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    args, scalar, want, g_want = _mixed_saturation_batch(n_saturated)
    # bucket=1 < n; bucket2=3 -> n=2 exercises tier 2, n=4 the whole batch
    with config_override(repair_bucket=1, repair_bucket2=3, log_fallback=True):
        got = classic_ctc_loss(*args, 0)
        g_got = jax.grad(scalar)(args[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), atol=1e-4
    )


@pytest.mark.parametrize("struct", ["while", "cond"])
def test_tier2_repairs_above_the_hbm_cap(struct):
    """Above the whole-batch HBM cap the tier-2 gather survives: up to
    bucket2 flushed samples are still repaired exactly (finite), and the
    clean samples keep their fast values."""
    from tf_seq2seq_losses_tpu import classic_ctc_loss

    from tf_seq2seq_losses_tpu.ops.topology import _est_fallback_bytes

    args, scalar, want, g_want = _mixed_saturation_batch(2)
    ctx = core_mod.make_context(args[0], args[1], args[2], args[3], 0)
    # cap admits the bucket2=3 mini-batch exactly but not the full batch;
    # the tier-2 branch runs the log KERNELS, so its footprint (and hence
    # the cap this test pins) is the lane-padded estimate (ADVICE r3)
    cap = _est_fallback_bytes(
        3, args[1].shape[1], ctx.label.shape[1], lane_pad=True
    )
    with config_override(
        repair_bucket=1, repair_bucket2=3, log_fallback=True,
        guard_struct=struct,
    ):
        import os

        old = os.environ.get("CTC_TPU_GUARD_FALLBACK_BYTES")
        os.environ["CTC_TPU_GUARD_FALLBACK_BYTES"] = str(cap)
        try:
            if struct == "cond":
                # cond struct: the whole-batch branch is dropped with a
                # warning; while struct: bounded repair rounds never had
                # one, so no warning — but the repair still happens.
                with pytest.warns(
                    UserWarning, match="whole-batch exact reroute"
                ):
                    got = classic_ctc_loss(*args, 0)
            else:
                got = classic_ctc_loss(*args, 0)
        finally:
            if old is None:
                os.environ.pop("CTC_TPU_GUARD_FALLBACK_BYTES")
            else:
                os.environ["CTC_TPU_GUARD_FALLBACK_BYTES"] = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


# Heavy-module compiled-state bound (see tests/conftest.py
# bound_compiled_state_fixture docstring: jaxlib 0.9.0 segfault).
from tests.conftest import bound_compiled_state_fixture

_bound_compiled_state = bound_compiled_state_fixture()
