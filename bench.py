"""Benchmark: classic CTC loss fwd+grad at B=256, T=500, V=32 on the default device.

Protocol mirrors the reference benchmark harness
(/root/reference/tests/benchmark.py:38-56, 205-237): seeded random inputs with
``logit_length in [T/2, T)``, ``label_length in [T/4, T/2)``, 3 warm-up runs,
10 timed runs of the jitted fwd+grad graph, mean wall time with
``block_until_ready``.

Baseline: the reference reports 0.28 ms for the classic gradient at
B=256, T=255, V=32 on a GTX 970 (README.md:18-21).  The loss is O(T), so the
equivalent baseline at T=500 is 0.28 * 500/255 = 0.549 ms;
``vs_baseline = 0.549 / our_ms`` (>1 means faster than the reference's GPU).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss, ctc_loss_gradient, ctc_loss_hessian
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


def timed(fn, args, warmup=3, steps=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.mean(times) * 1e3), float(np.std(times) * 1e3)


def parity_check():
    """Small-shape grad (vs finite differences) and Hessian checks.

    All T*V finite-difference perturbations are evaluated as one stacked
    batch so the whole check costs two compilations (important: compiles on
    the tunneled TPU run remotely at ~30 s each).
    """
    bsz, t_len, vocab = 2, 6, 4
    labels, logits, ll, gl = make_inputs(bsz, t_len, vocab, seed=1)
    lp = logit_to_logproba(logits, 2)
    eps = 1e-3

    @jax.jit
    def grad_and_losses(logits_):
        g = jax.grad(
            lambda x: jnp.sum(classic_ctc_loss(labels, x, ll, gl, 0))
        )(logits_)
        # one stacked batch: [1 + T*V, B] losses (base + each perturbation)
        eye = jnp.eye(t_len * vocab, dtype=jnp.float32).reshape(
            t_len * vocab, 1, t_len, vocab
        )
        stacked = jnp.concatenate(
            [logits_[None], logits_[None] + eps * eye], axis=0
        ).reshape((1 + t_len * vocab) * bsz, t_len, vocab)
        rep = lambda x: jnp.tile(x, (1 + t_len * vocab,) + (1,) * (x.ndim - 1))
        losses = classic_ctc_loss(
            rep(labels), stacked, rep(ll), rep(gl), 0
        ).reshape(1 + t_len * vocab, bsz)
        return g, losses

    g_auto, losses = jax.block_until_ready(grad_and_losses(logits))
    g_auto = np.asarray(g_auto)
    losses = np.asarray(losses)
    fd = ((losses[1:] - losses[0][None]) / eps).reshape(t_len, vocab, bsz)
    fd = np.transpose(fd, [2, 0, 1])
    ok = bool(np.allclose(fd, g_auto, atol=2e-2))

    hess_lp = np.asarray(ctc_loss_hessian(labels, lp, ll, gl, 0, "classic"))
    ok &= bool(np.isfinite(hess_lp).all())
    # symmetry of the analytic Hessian
    ok &= bool(np.allclose(hess_lp, np.transpose(hess_lp, [0, 3, 4, 1, 2]), atol=1e-5))
    return ok


def main():
    args = make_inputs(BATCH, MAX_T, VOCAB)

    @jax.jit
    def fwd_grad(labels, logits, label_length, logit_length):
        return jax.value_and_grad(
            lambda x: jnp.mean(
                classic_ctc_loss(labels, x, label_length, logit_length, 0)
            )
        )(logits)

    ms, std = timed(fwd_grad, args)
    parity = parity_check()
    print(
        json.dumps(
            {
                "metric": "classic_ctc_loss fwd+grad ms/batch (B=256,T=500,V=32)",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 3),
                "std_ms": round(std, 4),
                "parity": parity,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
