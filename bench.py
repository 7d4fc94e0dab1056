"""Benchmark: classic CTC loss fwd+grad at B=256, T=500, V=32 on the default device.

Protocol follows the reference harness' shape/seed conventions
(/root/reference/tests/benchmark.py:38-56: ``logit_length in [T/2, T)``,
``label_length in [T/4, T/2)``) but with TPU-honest timing: the per-call
dispatch path of this environment's tunneled TPU backend reports readiness
early and charges a fixed ~30 ms RPC per host readback, so each measurement
runs ``n`` serialized iterations inside ONE jitted ``lax.fori_loop`` (each
iteration's input depends on the previous result) and differences the n=1 and
n=N wall times: ``ms_per_iter = (t_N - t_1) / (N - 1)``.

Baseline: the reference reports 0.28 ms for the classic gradient at
B=256, T=255, V=32 on a GTX 970 (README.md:18-21).  The loss is O(T), so the
equivalent baseline at T=500 is 0.28 * 500/255 = 0.549 ms;
``vs_baseline = 0.549 / our_ms`` (>1 means faster than the reference's GPU).
(Note: the reference's own timing never synchronises the GPU — datetime
around an async ``tf.function`` call, benchmark.py:220-231 — so its numbers
are dispatch times, i.e. a *hard* baseline.)

Prints exactly one JSON line.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss, ctc_loss_hessian
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

BATCH, MAX_T, VOCAB = 256, 500, 32
BASELINE_MS = 0.28 * (MAX_T / 255.0)  # reference classic grad, scaled in T


def make_inputs(batch, max_t, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randint(1, vocab, (batch, max_t // 2)).astype(np.int32)),
        jnp.asarray(rng.randn(batch, max_t, vocab).astype(np.float32)),
        jnp.asarray(rng.randint(max_t // 4, max_t // 2, (batch,)).astype(np.int32)),
        jnp.asarray(rng.randint(max_t // 2, max_t, (batch,)).astype(np.int32)),
    )


@partial(jax.jit, static_argnames=("n",))
def _fwd_grad_loop(labels, logits, label_length, logit_length, n):
    def body(i, acc):
        x = logits + acc * 0.0 + i.astype(jnp.float32) * 1e-6
        loss, grad = jax.value_and_grad(
            lambda y: jnp.mean(
                classic_ctc_loss(labels, y, label_length, logit_length, 0)
            )
        )(x)
        return acc + loss + jnp.sum(grad) * 1e-9

    return jax.lax.fori_loop(0, n, body, 0.0)


def timed_per_iter(args, n_hi=16, reps=3):
    float(_fwd_grad_loop(*args, n=1))
    float(_fwd_grad_loop(*args, n=n_hi))

    def best(n):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(_fwd_grad_loop(*args, n=n))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    t1, thi = best(1), best(n_hi)
    per_iter = (thi - t1) / (n_hi - 1) * 1e3
    return per_iter


def parity_check():
    """Small-shape grad (vs finite differences) and Hessian checks.

    All T*V finite-difference perturbations are evaluated as one stacked
    batch so the whole check costs two compilations (compiles on the
    tunneled TPU run remotely at ~30 s each)."""
    bsz, t_len, vocab = 2, 6, 4
    labels, logits, ll, gl = make_inputs(bsz, t_len, vocab, seed=1)
    lp = logit_to_logproba(logits, 2)
    eps = 1e-3

    @jax.jit
    def grad_and_losses(labels, logits_, ll, gl):
        g = jax.grad(
            lambda x: jnp.sum(classic_ctc_loss(labels, x, ll, gl, 0))
        )(logits_)
        eye = jnp.eye(t_len * vocab, dtype=jnp.float32).reshape(
            t_len * vocab, 1, t_len, vocab
        )
        stacked = jnp.concatenate(
            [logits_[None], logits_[None] + eps * eye], axis=0
        ).reshape((1 + t_len * vocab) * bsz, t_len, vocab)
        rep = lambda x: jnp.tile(  # noqa: E731
            x, (1 + t_len * vocab,) + (1,) * (x.ndim - 1)
        )
        losses = classic_ctc_loss(
            rep(labels), stacked, rep(ll), rep(gl), 0
        ).reshape(1 + t_len * vocab, bsz)
        return g, losses

    g_auto, losses = jax.device_get(grad_and_losses(labels, logits, ll, gl))
    fd = ((losses[1:] - losses[0][None]) / eps).reshape(t_len, vocab, bsz)
    fd = np.transpose(fd, [2, 0, 1])
    ok = bool(np.allclose(fd, np.asarray(g_auto), atol=2e-2))

    hess = np.asarray(
        jax.jit(
            lambda la, x, a, b: ctc_loss_hessian(la, x, a, b, 0, "classic")
        )(labels, lp, ll, gl)
    )
    ok &= bool(np.isfinite(hess).all())
    ok &= bool(np.allclose(hess, np.transpose(hess, [0, 3, 4, 1, 2]), atol=1e-5))
    return ok


def main():
    args = make_inputs(BATCH, MAX_T, VOCAB)
    ms = timed_per_iter(args)
    parity = parity_check()
    print(
        json.dumps(
            {
                "metric": "classic_ctc_loss fwd+grad ms/batch (B=256,T=500,V=32)",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 4),
                "parity": parity,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
