"""Fused d_logits epilogue (scatter matmul + assembly + softmax VJP in one
Pallas kernel — pallas_lattice._fused_epilogue_call).

The fused path only engages on streamed single-chunk geometries with a
lane-aligned vocabulary (``num_tokens % 128 == 0``), so every test here runs
at V=128 in interpret mode and pins the fused output against the unfused
composition (``config_override(fused_epilogue=False)`` — the path every
other test in the suite exercises).  Covered: plain VJP parity on both
topologies, non-trivial per-sample cotangents, blank != 0, infeasible
samples, the saturation-guard repair riding the fused value, and
second-order derivatives (the fused custom VJP must defer to the unfused
rules exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss
from tf_seq2seq_losses_tpu.ops.pallas_lattice import fused_epilogue_ok
from tf_seq2seq_losses_tpu.utils.config import config_override

V = 128
INTERP = dict(use_pallas=True, interpret=True, block_batch=2, block_time=4)


@pytest.fixture(autouse=True)
def no_persistent_cache():
    # Persistent-cache opt-out — see tests/test_guard_sweep.py::guard_config:
    # jaxlib 0.9.0 segfaults (de)serializing the guard's whole-batch
    # escalation executables; this file compiles the V=128 variants.
    # NOTE: jax_enable_compilation_cache is latched at first use
    # (compilation_cache.is_cache_used caches its decision per process), so
    # the per-call write gate min_compile_time_secs is the working opt-out.
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        yield
    finally:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old
        )


def _inputs(seed=0, batch=4, num_t=9, max_l=4, blank=0):
    rand = np.random.RandomState(seed)
    logits = jnp.asarray(
        rand.randn(batch, num_t, V).astype(np.float32)
    )
    lo = 1 if blank == 0 else 0
    labels = jnp.asarray(
        rand.randint(lo, V, size=(batch, max_l)).astype(np.int32)
    )
    labels = jnp.where(labels == blank, (blank + 1) % V, labels)
    label_length = jnp.asarray(
        rand.randint(0, max_l + 1, size=(batch,)).astype(np.int32)
    )
    logit_length = jnp.asarray(
        rand.randint(num_t // 2, num_t + 1, size=(batch,)).astype(np.int32)
    )
    return labels, logits, label_length, logit_length


def _vjp(fn, labels, logits, label_length, logit_length, ct, blank=0):
    _, pull = jax.vjp(
        lambda lg: fn(labels, lg, label_length, logit_length, blank), logits
    )
    return pull(ct)[0]


@pytest.mark.parametrize(
    "fn",
    [classic_ctc_loss,
     pytest.param(simplified_ctc_loss, marks=pytest.mark.slow)],
)
def test_fused_dlogits_matches_unfused(fn):
    labels, logits, ll, gl = _inputs(seed=1)
    ct = jnp.asarray(np.random.RandomState(7).randn(4).astype(np.float32))
    with config_override(**INTERP, fused_epilogue=True):
        assert fused_epilogue_ok(4, 9, V, labels.shape[1] + 1)
        out_f = _vjp(fn, labels, logits, ll, gl, ct)
    with config_override(**INTERP, fused_epilogue=False):
        out_u = _vjp(fn, labels, logits, ll, gl, ct)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=1e-5
    )


def test_fused_dlogits_nonzero_blank():
    labels, logits, ll, gl = _inputs(seed=2, blank=5)
    ct = jnp.ones((4,), jnp.float32)
    with config_override(**INTERP, fused_epilogue=True):
        out_f = _vjp(simplified_ctc_loss, labels, logits, ll, gl, ct, blank=5)
    with config_override(**INTERP, fused_epilogue=False):
        out_u = _vjp(simplified_ctc_loss, labels, logits, ll, gl, ct, blank=5)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=1e-5
    )


def test_fused_dlogits_infeasible_rows_zero():
    labels, logits, ll, gl = _inputs(seed=3)
    # sample 0: label longer than logit_length -> +inf loss, zero d_logits
    ll = ll.at[0].set(4)
    gl = gl.at[0].set(2)
    ct = jnp.ones((4,), jnp.float32)
    with config_override(**INTERP, fused_epilogue=True):
        out_f = _vjp(classic_ctc_loss, labels, logits, ll, gl, ct)
    with config_override(**INTERP, fused_epilogue=False):
        out_u = _vjp(classic_ctc_loss, labels, logits, ll, gl, ct)
    assert np.all(np.asarray(out_f[0]) == 0.0)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=1e-5
    )


@pytest.mark.slow
def test_fused_dlogits_guard_repair():
    """A feasible sample whose fast loss flushes (saturated logits) must be
    repaired through the pure path inside the fused branch too."""
    labels, logits, ll, gl = _inputs(seed=4)
    # Saturate sample 1 towards a wrong token everywhere: probability-space
    # kernels flush, log-space pure path stays exact.
    bad = jnp.full(logits.shape[1:], -1e9, jnp.float32)
    bad = bad.at[:, 3].set(0.0)
    logits = logits.at[1].set(bad)
    labels = labels.at[1].set(jnp.array([1, 2, 1, 2], jnp.int32))
    ll = ll.at[1].set(4)
    gl = gl.at[1].set(9)
    ct = jnp.asarray(np.random.RandomState(11).randn(4).astype(np.float32))
    with config_override(**INTERP, fused_epilogue=True):
        out_f = _vjp(classic_ctc_loss, labels, logits, ll, gl, ct)
    with config_override(use_pallas=False):
        out_p = _vjp(classic_ctc_loss, labels, logits, ll, gl, ct)
    assert np.all(np.isfinite(np.asarray(out_f)))
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), atol=2e-5
    )


@pytest.mark.slow
def test_fused_dlogits_tier2_escalation():
    """More flushed samples than repair_bucket but within repair_bucket2:
    the gathered log-kernel tier must repair the fused d_logits (the aux
    cotangent rows ride the gather) and match the pure reference.

    Saturation scale: -200-per-frame wrong-certain logits flush the
    probability-space kernels (~87-nat float32 range) while staying far
    inside float32 log-space resolution, so the log-kernel and pure exact
    paths agree to tolerance.  (At 1e9-scale logits both paths are
    individually stable but their sub-ULP path-tie rounding differs — the
    reference pins only loss/one-hot-grad there, not cross-implementation
    d_logits equality.)"""
    labels, logits, ll, gl = _inputs(seed=6)
    bad = jnp.full(logits.shape[1:], -200.0, jnp.float32)
    bad = bad.at[:, 3].set(0.0)
    for b in range(3):  # saturate samples 0..2 (feasible, flushing)
        logits = logits.at[b].set(bad)
        labels = labels.at[b].set(jnp.array([1, 2, 1, 2], jnp.int32))
    ll = jnp.asarray([4, 4, 4, int(ll[3])], jnp.int32)
    gl = jnp.asarray([9, 9, 9, int(gl[3])], jnp.int32)
    ct = jnp.asarray(np.random.RandomState(13).randn(4).astype(np.float32))
    with config_override(
        **INTERP, fused_epilogue=True, repair_bucket=1, repair_bucket2=3
    ):
        out_f = _vjp(classic_ctc_loss, labels, logits, ll, gl, ct)
    with config_override(use_pallas=False):
        out_p = _vjp(classic_ctc_loss, labels, logits, ll, gl, ct)
    assert np.all(np.isfinite(np.asarray(out_f)))
    # |loss| ~ 1800 nats: two exact log-space implementations can differ by
    # ~|loss|*eps_f32 ~ 2e-4 in the log domain; this is a ROUTING test
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), atol=5e-4
    )


@pytest.mark.slow
def test_fused_dlogits_second_order_matches():
    """jacrev over the logits-level gradient must be identical with the
    fusion on or off (the fused custom VJP defers to the unfused rules)."""
    labels = jnp.array([[1, 2], [3, 0]], jnp.int32)
    logits = jnp.asarray(
        np.random.RandomState(0).randn(2, 4, V).astype(np.float32)
    )
    ll = jnp.array([2, 1], jnp.int32)
    gl = jnp.array([4, 3], jnp.int32)

    def scalar(fn):
        def f(x):
            out = classic_ctc_loss(labels, x, ll, gl, 0)
            return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

        return f

    with config_override(**INTERP, fused_epilogue=True):
        h_f = jax.jacrev(jax.grad(scalar(classic_ctc_loss)))(logits)
    with config_override(**INTERP, fused_epilogue=False):
        h_u = jax.jacrev(jax.grad(scalar(classic_ctc_loss)))(logits)
    np.testing.assert_allclose(
        np.asarray(h_f), np.asarray(h_u), atol=2e-5
    )


def test_fused_gate_static():
    """The gate refuses unaligned vocabularies, chunked geometries and the
    disabled flag."""
    with config_override(**INTERP, fused_epilogue=True):
        assert fused_epilogue_ok(4, 9, 128, 5)
        assert not fused_epilogue_ok(4, 9, 32, 5)
        assert not fused_epilogue_ok(0, 9, 128, 5)
    with config_override(**INTERP, fused_epilogue=False):
        assert not fused_epilogue_ok(4, 9, 128, 5)
    with config_override(**INTERP, fused_epilogue=True, stream_residuals=False):
        assert not fused_epilogue_ok(4, 9, 128, 5)
    with config_override(
        **INTERP, fused_epilogue=True, chunk_time=4
    ):
        # two chunks at T=9 -> streamed pack unavailable
        assert not fused_epilogue_ok(4, 9, 128, 5)


@pytest.mark.slow
def test_fused_dlogits_under_vmap():
    """The fused kernel batches correctly under vmap (pallas batching
    rule adds a grid dim); parity vs the unfused path."""
    rng = np.random.default_rng(0)
    G, B, T, L = 2, 2, 9, 3
    logits = jnp.asarray(rng.normal(size=(G, B, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, size=(G, B, L)).astype(np.int32))
    ll = jnp.full((G, B), 3, jnp.int32)
    gl = jnp.full((G, B), 9, jnp.int32)

    def per_group(lg, la, l1, l2):
        _, pull = jax.vjp(
            lambda x: classic_ctc_loss(la, x, l1, l2, 0), lg
        )
        return pull(jnp.ones((B,)))[0]

    with config_override(**INTERP, fused_epilogue=True):
        out = jax.vmap(per_group)(logits, labels, ll, gl)
    with config_override(**INTERP, fused_epilogue=False):
        ref = jax.vmap(per_group)(logits, labels, ll, gl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_fused_dlogits_under_shard_map():
    """Data-parallel shard_map over the fused path: each shard runs the
    fused kernel locally; gradient matches the unfused path."""
    from tf_seq2seq_losses_tpu.parallel.sharding import (
        make_mesh, shard_batch, sharded_mean_ctc_loss,
    )

    rng = np.random.default_rng(0)
    B, T, L = 8, 9, 3
    logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, size=(B, L)).astype(np.int32))
    ll = jnp.full((B,), 3, jnp.int32)
    gl = jnp.full((B,), 9, jnp.int32)
    mesh = make_mesh()

    def run(fused):
        with config_override(**INTERP, fused_epilogue=fused):
            fn = sharded_mean_ctc_loss(mesh)
            args = shard_batch(mesh, (labels, logits, ll, gl))
            return jax.value_and_grad(
                lambda x: fn(args[0], x, args[2], args[3])
            )(args[1])

    v_f, g_f = run(True)
    v_u, g_u = run(False)
    np.testing.assert_allclose(float(v_f), float(v_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_u), atol=1e-5)


# Heavy-module compiled-state bound (see tests/conftest.py
# bound_compiled_state_fixture docstring: jaxlib 0.9.0 segfault).
from tests.conftest import bound_compiled_state_fixture

_bound_compiled_state = bound_compiled_state_fixture()
