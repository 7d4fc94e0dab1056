"""Exhaustive branch sweep of the saturation guard decision lattice
(``ops/topology.py::_guarded`` — VERDICT r3 "next" #6).

``_guarded`` is a 4-way-branched, two-form (scalar / tensor) decision
lattice over (n_flushed x bucket x bucket2 x HBM-cap x output-form).  The
existing tests pin the main cells; this file sweeps the full product at
tiny shapes (B=8, T=6), asserting against the pure path with the repair
coverage each cell guarantees:

* ``both_fit``   (default cap): every branch repairs ALL flushed samples
  (bucket gather, tier-2 gather, whole-batch exact) — exact agreement.
* ``bucket_only`` (cap admits the tier-2 mini-batch, not the full batch,
  topology.py ``if not full_fits`` arms): the first ``bucket2`` flushed
  samples are repaired, any beyond keep +inf loss / zero gradient.
* ``none_fit``   (cap below even the bucket branch, topology.py guard-
  disabled arm): no repairs — every flushed sample keeps +inf / zero.

Forms: per-sample loss (scalar lattice, ``lax.switch``), [B, T, V]
gradient (scatter form — the big-tensor lattice), and the fused
d_logits-with-aux form (V=128 + fused_epilogue, ``aux=d_loss``).
"""

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.api import ctc_loss_from_logproba
from tf_seq2seq_losses_tpu.ops import core as core_mod
from tf_seq2seq_losses_tpu.ops.topology import _est_fallback_bytes
from tf_seq2seq_losses_tpu.utils.config import config_override
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

pytestmark = pytest.mark.slow

BATCH, MAX_T, VOCAB = 8, 6, 4
BUCKET, BUCKET2 = 2, 4
N_FLUSHED = [0, 1, BUCKET, BUCKET + 1, BUCKET2, BUCKET2 + 1, BATCH]
LP1 = 3  # labels [1, 2] + forced blank


@pytest.fixture(autouse=True, params=["while", "cond"])
def guard_config(request):
    # Persistent-cache opt-out: jaxlib 0.9.0's native CPU executable
    # (de)serialization segfaults on this suite's largest modules — the
    # guard's whole-batch escalation executables (both lax.cond branches:
    # fast kernels + log kernels + gather repair) — when the process has
    # already compiled a few hundred modules (3/3 full slow-suite runs
    # crashed inside serialize_executable/deserialize_executable at these
    # tests; every shorter window run passes).  Keeping these modules out
    # of the persistent cache sidesteps the jaxlib bug at a few seconds of
    # recompile per session.
    # NOTE: jax_enable_compilation_cache is latched at first use
    # (compilation_cache.is_cache_used caches its decision per process), so
    # the per-call write gate min_compile_time_secs is the working opt-out.
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        with config_override(
            use_pallas=True, interpret=True, block_batch=2, block_time=4,
            repair_bucket=BUCKET, repair_bucket2=BUCKET2, log_fallback=True,
            sort_by_length=False,  # keep sample order == repair order
            guard_struct=request.param,  # sweep BOTH structural forms
        ):
            yield
    finally:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old
        )


def _batch(n_flushed, vocab=VOCAB):
    """First ``n_flushed`` samples are wrong-certain (prob-space flush on
    the fast path: +inf fast loss, feasible), the rest random."""
    rand = np.random.RandomState(11)
    logits = rand.randn(BATCH, MAX_T, vocab).astype(np.float32)
    logits[:n_flushed] = 0.0
    logits[:n_flushed, :, vocab - 1] = 100.0
    labels = np.tile(np.array([[1, 2]], np.int32), (BATCH, 1))
    return (
        jnp.asarray(labels),
        jnp.asarray(logits),
        jnp.full((BATCH,), 2, jnp.int32),
        jnp.full((BATCH,), MAX_T, jnp.int32),
    )


def _pure(args):
    def scalar_logits(x):
        out = classic_ctc_loss(args[0], x, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    def scalar_lp(lp):
        out = ctc_loss_from_logproba(args[0], lp, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    lp = logit_to_logproba(args[1], 2)
    with config_override(use_pallas=False):
        loss = np.asarray(classic_ctc_loss(*args, 0))
        g_logits = np.asarray(jax.grad(scalar_logits)(args[1]))
        g_lp = np.asarray(jax.grad(scalar_lp)(lp))
    return loss, g_logits, g_lp, lp, scalar_logits, scalar_lp


def _expect(pure_val, n_flushed, n_repaired, fill):
    """Pure-path oracle with the unrepaired flushed rows replaced: the
    guard repairs flushed samples in index order (stable argsort of the
    flush mask; sorting disabled), so rows [n_repaired, n_flushed) keep
    their fast-path value (+inf loss / zero gradient rows)."""
    out = pure_val.copy()
    out[n_repaired:n_flushed] = fill
    return out


def _cap_env(fits):
    if fits == "both_fit":
        return None
    if fits == "bucket_only":
        # admits the tier-2 log-kernel gather (lane-padded footprint) and
        # the tier-1 pure-path bucket, but not the whole batch
        return _est_fallback_bytes(BUCKET2, MAX_T, LP1, lane_pad=True)
    # none_fit: below even the BUCKET-sample pure branch
    return _est_fallback_bytes(BUCKET, MAX_T, LP1) - 1


def _repaired(fits, n_flushed):
    from tf_seq2seq_losses_tpu.utils.config import get_config

    if fits == "both_fit":
        return n_flushed
    if fits == "bucket_only":
        if get_config().guard_struct == "while":
            # the while struct's bounded repair rounds cover every flushed
            # row regardless of the whole-batch cap (no whole branch)
            return n_flushed
        return min(n_flushed, BUCKET2)
    return 0


@pytest.fixture(params=["both_fit", "bucket_only", "none_fit"])
def fits(request):
    cap = _cap_env(request.param)
    old = os.environ.get("CTC_TPU_GUARD_FALLBACK_BYTES")
    if cap is not None:
        os.environ["CTC_TPU_GUARD_FALLBACK_BYTES"] = str(cap)
    try:
        yield request.param
    finally:
        if old is None:
            os.environ.pop("CTC_TPU_GUARD_FALLBACK_BYTES", None)
        else:
            os.environ["CTC_TPU_GUARD_FALLBACK_BYTES"] = old


@pytest.mark.parametrize("n_flushed", N_FLUSHED)
def test_loss_and_gradient_forms(fits, n_flushed):
    args = _batch(n_flushed)
    loss_p, g_logits_p, g_lp_p, lp, scalar_logits, scalar_lp = _pure(args)
    k = _repaired(fits, n_flushed)

    with warnings.catch_warnings():
        # the degraded-cap warnings are pinned by test_guard_cap.py
        warnings.simplefilter("ignore", UserWarning)
        got_loss = np.asarray(classic_ctc_loss(*args, 0))
        got_g_logits = np.asarray(jax.grad(scalar_logits)(args[1]))
        got_g_lp = np.asarray(jax.grad(scalar_lp)(lp))

    np.testing.assert_allclose(
        got_loss, _expect(loss_p, n_flushed, k, np.inf), rtol=1e-5,
        err_msg=f"loss form, fits={fits}, n={n_flushed}",
    )
    np.testing.assert_allclose(
        got_g_logits, _expect(g_logits_p, n_flushed, k, 0.0), atol=1e-4,
        err_msg=f"d_logits form, fits={fits}, n={n_flushed}",
    )
    np.testing.assert_allclose(
        got_g_lp, _expect(g_lp_p, n_flushed, k, 0.0), atol=1e-4,
        err_msg=f"[B,T,V] gradient form, fits={fits}, n={n_flushed}",
    )


@pytest.mark.parametrize("n_flushed", [0, 1, BUCKET + 1, BUCKET2 + 1, BATCH])
@pytest.mark.parametrize("fits_name", ["both_fit", "bucket_only"])
def test_fused_dlogits_aux_form(fits_name, n_flushed):
    """The aux-carrying guard form (``dlogits_fast``: fast value is the
    complete logits cotangent, ``aux`` is the loss cotangent) across the
    same repair tiers — V=128 + fused_epilogue engages the fused kernel
    (topology.py ``_guarded(..., aux=d_loss)``)."""
    args = _batch(n_flushed, vocab=128)

    def scalar(x):
        out = classic_ctc_loss(args[0], x, args[2], args[3], 0)
        # non-uniform cotangent so aux gathering is actually exercised
        w = jnp.arange(1.0, BATCH + 1.0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0) * w)

    with config_override(use_pallas=False):
        g_pure = np.asarray(jax.grad(scalar)(args[1]))
    k = _repaired(fits_name, n_flushed)

    cap = _cap_env(fits_name)
    old = os.environ.get("CTC_TPU_GUARD_FALLBACK_BYTES")
    if cap is not None:
        os.environ["CTC_TPU_GUARD_FALLBACK_BYTES"] = str(cap)
    try:
        with config_override(fused_epilogue=True), warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            from tf_seq2seq_losses_tpu.ops.topology import _dlogits_ok

            assert _dlogits_ok(BATCH, MAX_T, 128, LP1)
            got = np.asarray(jax.grad(scalar)(args[1]))
    finally:
        if old is None:
            os.environ.pop("CTC_TPU_GUARD_FALLBACK_BYTES", None)
        else:
            os.environ["CTC_TPU_GUARD_FALLBACK_BYTES"] = old

    # atol: the library's 1e-4 gradient tolerance scaled by the cotangent
    # weights (up to B=8) this test uses to exercise aux gathering — the
    # repaired rows come from the log kernels, whose rounding is absolute
    # in the cotangent-scaled gradient
    np.testing.assert_allclose(
        got, _expect(g_pure, n_flushed, k, 0.0), atol=1e-3,
        err_msg=f"fused dlogits aux form, fits={fits_name}, n={n_flushed}",
    )


# Heavy-module compiled-state bound (see tests/conftest.py
# bound_compiled_state_fixture docstring: jaxlib 0.9.0 segfault).
from tests.conftest import bound_compiled_state_fixture

_bound_compiled_state = bound_compiled_state_fixture()
