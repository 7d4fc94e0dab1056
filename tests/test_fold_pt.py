"""Folded transition streaming (``config.fold_pt``).

With the fold on, the classic kernels receive ONE unmasked expected-token
tensor ``dcu [B, T, Lpad]`` instead of the concat ``dcpt [B, T, 2*Lpad]``
and derive ``dc = dcu * label_mask`` / ``pt = roll(dcu, 1)`` per step
(pallas_lattice._step_transitions).  The derivation is mathematically exact;
numerically the rearranged op order drifts from the unfolded path as the
per-step rounding differences compound through the T-scan and are amplified
by the final ``-exp``.  Measured on this corpus (T=12, interpret mode): the
LOSS agrees to 1 float32 ULP; the worst GRADIENT element drifts ~5e-6
relative (~7e-8 absolute).  These tests pin a calibrated contract — loss to
16 ULPs, gradient to rtol 1e-4 / atol 1e-7 — still ~100x tighter than the
library's 1e-5 absolute gradient contract — against the unfolded path on
every gradient scheme (streamed, residual-free recompute, chunked long-T),
with repeated labels (the ``pt`` repeat-horizontal term is live),
blank != 0, labels extending to the full padded width (the lane-``lp1``
wraparound edge), and the saturation guard.

History: before the round-5 ``_cfg_jit`` trace-identity fix these
assertions compared a trace WITH ITSELF (same-function jit wrappers share
JAX's trace cache), so the original ``assert_array_equal`` form never
actually ran two executables; the genuine comparison shows the drift these
tolerances encode.  Each config is separately pinned against the pure
log-space path at 1e-5 elsewhere (test_config_cache, enumeration oracle),
so this file's job is cross-config regression, not absolute correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override

INTERP = dict(use_pallas=True, interpret=True, block_batch=2, block_time=4)


def assert_ulp_close(actual, desired, ulps=16):
    """Elementwise |a - d| <= ulps * spacing(d): a bit-level contract that
    scales with magnitude (unlike an absolute atol) and stays meaningful at
    gradient entries near zero (unlike a pure rtol)."""
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    tol = ulps * np.spacing(np.maximum(np.abs(desired), np.float32(1e-30)))
    bad = ~(np.abs(actual - desired) <= tol)
    finite_mismatch = np.isfinite(actual) != np.isfinite(desired)
    assert not finite_mismatch.any(), "finiteness mismatch"
    bad &= np.isfinite(desired)
    if bad.any():
        i = np.unravel_index(np.argmax(np.abs(actual - desired) * bad), bad.shape)
        raise AssertionError(
            f"{bad.sum()} elements beyond {ulps} ULPs; worst at {i}: "
            f"{actual[i]!r} vs {desired[i]!r}"
        )


def _inputs():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 12, 8)).astype(np.float32))
    # repeated labels exercise the preceded-token (pt) term; row 3 fills
    # the whole label width (label_length == max_label_length, so the live
    # lattice reaches lane lp1 - 1 — the roll-wraparound edge)
    labels = jnp.asarray(
        [[1, 1, 2, 2, 3], [2, 3, 2, 3, 1], [1, 1, 1, 1, 1], [4, 5, 6, 7, 2]],
        np.int32,
    )
    label_length = jnp.asarray([5, 4, 3, 5], np.int32)
    logit_length = jnp.asarray([12, 10, 8, 11], np.int32)
    ct = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    return labels, logits, label_length, logit_length, ct


def _loss_and_dlogits(fold, blank=0, **kw):
    labels, logits, ll, gl, ct = _inputs()
    with config_override(**INTERP, fold_pt=fold, **kw):
        loss, pull = jax.vjp(
            lambda lg: classic_ctc_loss(labels, lg, ll, gl, blank), logits
        )
        return np.asarray(loss), np.asarray(pull(ct)[0])


def assert_grad_close(actual, desired):
    """Calibrated cross-config gradient contract (see module docstring)."""
    np.testing.assert_allclose(actual, desired, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize(
    "kw",
    [{}, {"stream_residuals": False}, {"chunk_time": 4}, {"window": 1}],
    ids=["streamed", "recompute", "chunked", "window1"],
)
def test_fold_pt_parity(kw):
    l1, g1 = _loss_and_dlogits(True, **kw)
    l0, g0 = _loss_and_dlogits(False, **kw)
    assert_ulp_close(l1, l0)
    assert_grad_close(g1, g0)


def test_fold_pt_nonzero_blank():
    l1, g1 = _loss_and_dlogits(True, blank=7)
    l0, g0 = _loss_and_dlogits(False, blank=7)
    assert_ulp_close(l1, l0)
    assert_grad_close(g1, g0)


@pytest.mark.slow
def test_fold_pt_guard_saturated():
    """Folded fast path + guard: a flushed feasible sample still repairs."""
    labels, logits, ll, gl, ct = _inputs()
    bad = jnp.full(logits.shape[1:], -1e9, jnp.float32)
    bad = bad.at[:, 3].set(0.0)
    logits = logits.at[1].set(bad)
    with config_override(**INTERP, fold_pt=True):
        loss, pull = jax.vjp(
            lambda lg: classic_ctc_loss(labels, lg, ll, gl, 0), logits
        )
        g = pull(ct)[0]
    with config_override(use_pallas=False):
        loss_p, pull_p = jax.vjp(
            lambda lg: classic_ctc_loss(labels, lg, ll, gl, 0), logits
        )
        g_p = pull_p(ct)[0]
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss_p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_p), atol=2e-5)


@pytest.mark.slow
def test_fold_pt_with_fused_epilogue():
    """fold_pt composes with the fused d_logits epilogue (V=128 gate)."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(3, 9, 128)).astype(np.float32))
    labels = jnp.asarray([[1, 1, 2], [5, 6, 5], [9, 9, 9]], np.int32)
    ll = jnp.asarray([3, 3, 2], np.int32)
    gl = jnp.asarray([9, 7, 8], np.int32)
    ct = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))

    def run(fold, fused):
        with config_override(**INTERP, fold_pt=fold, fused_epilogue=fused):
            _, pull = jax.vjp(
                lambda lg: classic_ctc_loss(labels, lg, ll, gl, 0), logits
            )
            return np.asarray(pull(ct)[0])

    base = run(False, False)
    assert_grad_close(run(True, False), base)
    np.testing.assert_allclose(run(True, True), base, atol=1e-5)


@pytest.mark.parametrize(
    "kw",
    [{}, {"fold_pt": True}, {"window": 1}, {"unroll": False}],
    ids=["plain", "with-fold", "window1", "fori"],
)
def test_half_stream_parity(kw):
    """config.half_stream: the bwd kernel's rebuilt a0 (2-op recurrence in
    the stored window frames) matches the fully streamed pair to the
    calibrated drift in the module docstring (loss 1 ULP; worst gradient
    element ~5e-6 relative — op-order under XLA fusion compounding through
    the scan; the mantissa math is the same)."""
    fold = kw.pop("fold_pt", False)
    l1, g1 = _loss_and_dlogits(fold, half_stream=True, **kw)
    l0, g0 = _loss_and_dlogits(fold, half_stream=False, **kw)
    assert_ulp_close(l1, l0)
    assert_grad_close(g1, g0)


def test_half_stream_guard_saturated():
    labels, logits, ll, gl, ct = _inputs()
    bad = jnp.full(logits.shape[1:], -1e9, jnp.float32)
    bad = bad.at[:, 3].set(0.0)
    logits = logits.at[1].set(bad)
    with config_override(**INTERP, half_stream=True):
        loss, pull = jax.vjp(
            lambda lg: classic_ctc_loss(labels, lg, ll, gl, 0), logits
        )
        g = pull(ct)[0]
    with config_override(use_pallas=False):
        loss_p, pull_p = jax.vjp(
            lambda lg: classic_ctc_loss(labels, lg, ll, gl, 0), logits
        )
        g_p = pull_p(ct)[0]
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss_p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_p), atol=2e-5)


# Heavy-module compiled-state bound (see tests/conftest.py
# bound_compiled_state_fixture docstring: jaxlib 0.9.0 segfault).
from tests.conftest import bound_compiled_state_fixture

_bound_compiled_state = bound_compiled_state_fixture()
