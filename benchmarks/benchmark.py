"""Benchmark table: classic / simplified / optax.ctc_loss, forward and gradient.

The TPU-native analogue of the reference harness
(/root/reference/tests/benchmark.py:38-237): same input distribution
(B=256, V=32, T=255, seed 0, ``logit_length in [T/2, T)``,
``label_length in [T/4, T/2)``), same 3-warmup protocol, but with honest TPU
timing — ``n`` serialized iterations inside one jitted ``lax.fori_loop``
(every iteration's input depends on the previous result, so nothing can be
hoisted) and wall-time differencing between n=1 and n=N to cancel the
dispatch/readback constant of the tunneled backend.

``optax.ctc_loss`` plays the role of the reference's ``tf.nn.ctc_loss``
baseline: the stock JAX implementation of the same classic topology.

Run: ``python benchmarks/benchmark.py [--batch 256 --time 255 --vocab 32]``
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss


def make_inputs(batch, max_t, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randint(1, vocab, (batch, max_t // 2)).astype(np.int32)),
        jnp.asarray(rng.randn(batch, max_t, vocab).astype(np.float32)),
        jnp.asarray(rng.randint(max_t // 4, max_t // 2, (batch,)).astype(np.int32)),
        jnp.asarray(rng.randint(max_t // 2, max_t, (batch,)).astype(np.int32)),
    )


def optax_classic_loss(labels, logits, label_length, logit_length, blank_index):
    """optax.ctc_loss with the reference calling convention (blank=0)."""
    import optax

    max_t = logits.shape[1]
    max_l = labels.shape[1]
    logit_paddings = (
        jnp.arange(max_t)[None, :] >= logit_length[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(max_l)[None, :] >= label_length[:, None]
    ).astype(jnp.float32)
    return optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=blank_index
    )


def measure(loss_fn, args, grad: bool, n_hi=16, reps=5):
    labels, logits, label_length, logit_length = args

    def mean_finite(y):
        # mask genuinely infeasible samples (+inf loss): an inf mean would
        # turn acc*0.0 into NaN and poison every later iteration's input
        out = loss_fn(labels, y, label_length, logit_length, 0)
        finite = jnp.isfinite(out)
        return jnp.sum(jnp.where(finite, out, 0.0)) / jnp.sum(finite)

    def body_fwd(i, acc):
        x = logits + acc * 0.0 + i.astype(jnp.float32) * 1e-6
        return acc + mean_finite(x)

    def body_grad(i, acc):
        x = logits + acc * 0.0 + i.astype(jnp.float32) * 1e-6
        loss, g = jax.value_and_grad(mean_finite)(x)
        return acc + loss + jnp.sum(g) * 1e-9

    body = body_grad if grad else body_fwd

    @jax.jit
    def run_1():
        return jax.lax.fori_loop(0, 1, body, 0.0)

    @jax.jit
    def run_n():
        return jax.lax.fori_loop(0, n_hi, body, 0.0)

    # warmup / compile (reference uses 3 warmup passes, benchmark.py:113-115)
    for _ in range(3):
        float(run_1())
        float(run_n())

    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_1())
        t1 = time.perf_counter()
        float(run_n())
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (n_hi - 1) * 1e3)
    return float(np.mean(samples)), float(np.std(samples))


def measure_hessian(batch=2, max_t=5, vocab=3, n_hi=8, reps=5):
    """Analytic Hessian timing at the BASELINE toy config (O(T^2L^2) memory
    restricts it to small shapes, exactly as in the reference)."""
    from tf_seq2seq_losses_tpu import ctc_loss_hessian
    from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

    labels, logits, label_length, logit_length = make_inputs(batch, max_t, vocab)
    lp = logit_to_logproba(logits, 2)

    def body(i, acc):
        x = lp + acc * 0.0 + i.astype(jnp.float32) * 1e-6
        h = ctc_loss_hessian(labels, x, label_length, logit_length, 0)
        return acc + jnp.sum(jnp.where(jnp.isfinite(h), h, 0.0)) * 1e-9

    @jax.jit
    def run_1():
        return jax.lax.fori_loop(0, 1, body, 0.0)

    @jax.jit
    def run_n():
        return jax.lax.fori_loop(0, n_hi, body, 0.0)

    for _ in range(3):
        float(run_1())
        float(run_n())
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_1())
        t1 = time.perf_counter()
        float(run_n())
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (n_hi - 1) * 1e3)
    return float(np.mean(samples)), float(np.std(samples))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--time", type=int, default=255)
    parser.add_argument("--vocab", type=int, default=32)
    parser.add_argument("--skip-optax", action="store_true")
    parser.add_argument("--hessian", action="store_true")
    args_ns = parser.parse_args()

    args = make_inputs(args_ns.batch, args_ns.time, args_ns.vocab)
    impls = [
        ("classic_ctc_loss", classic_ctc_loss),
        ("simplified_ctc_loss", simplified_ctc_loss),
    ]
    if not args_ns.skip_optax:
        impls.append(("optax.ctc_loss", optax_classic_loss))

    dev = jax.devices()[0]
    print(
        f"device={dev}  B={args_ns.batch} T={args_ns.time} V={args_ns.vocab} "
        "(protocol: serialized fori_loop differencing, 3 warmup, 5 reps)"
    )
    print(f"{'implementation':24s} {'forward ms':>16s} {'gradient ms':>16s}")
    rows = {}
    for name, fn in impls:
        f_mean, f_std = measure(fn, args, grad=False)
        g_mean, g_std = measure(fn, args, grad=True)
        rows[name] = (f_mean, g_mean)
        print(
            f"{name:24s} {f_mean:9.3f}±{f_std:<6.3f} {g_mean:9.3f}±{g_std:<6.3f}"
        )
    if "optax.ctc_loss" in rows and "classic_ctc_loss" in rows:
        fx = rows["optax.ctc_loss"][0] / max(rows["classic_ctc_loss"][0], 1e-9)
        gx = rows["optax.ctc_loss"][1] / max(rows["classic_ctc_loss"][1], 1e-9)
        print(f"speedup vs optax.ctc_loss: forward {fx:.1f}x, gradient {gx:.1f}x")
    if args_ns.hessian:
        h_mean, h_std = measure_hessian()
        print(
            f"{'classic analytic Hessian (B=2,T=5,V=3)':36s}"
            f" {h_mean:9.3f}±{h_std:<6.3f} ms"
        )


if __name__ == "__main__":
    main()
