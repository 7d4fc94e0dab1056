"""Component-level timing on the real chip using the n-iteration differencing
protocol from bench.py (the tunneled backend's per-call RPC makes single-call
timing meaningless)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.ops import classic as classic_mod
from tf_seq2seq_losses_tpu.ops import core
from tf_seq2seq_losses_tpu.ops import pallas_lattice as pal
from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

BATCH, MAX_T, VOCAB = 256, 500, 32


def make_inputs(batch, max_t, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randint(1, vocab, (batch, max_t // 2)).astype(np.int32)),
        jnp.asarray(rng.randn(batch, max_t, vocab).astype(np.float32)),
        jnp.asarray(rng.randint(max_t // 4, max_t // 2, (batch,)).astype(np.int32)),
        jnp.asarray(rng.randint(max_t // 2, max_t, (batch,)).astype(np.int32)),
    )


def timeit(fn, args, n_hi=16, reps=3):
    """fn(args, n) must run n serialized iterations and return a scalar."""
    f = jax.jit(fn, static_argnames=("n",))
    float(f(*args, n=1))
    float(f(*args, n=n_hi))

    def best(n):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args, n=n))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(n_hi) - best(1)) / (n_hi - 1) * 1e3


def main():
    labels, logits, ll, gl = make_inputs(BATCH, MAX_T, VOCAB)
    args = (labels, logits, ll, gl)

    def loop(body):
        def fn(labels, logits, ll, gl, n):
            def step(i, acc):
                x = logits + acc * 0.0 + i.astype(jnp.float32) * 1e-6
                return acc + body(labels, x, ll, gl)

            return jax.lax.fori_loop(0, n, step, 0.0)

        return fn

    def fwd_only(labels, x, ll, gl):
        return jnp.mean(classic_ctc_loss(labels, x, ll, gl, 0))

    def fwd_grad(labels, x, ll, gl):
        loss, grad = jax.value_and_grad(
            lambda y: jnp.mean(classic_ctc_loss(labels, y, ll, gl, 0))
        )(x)
        return loss + jnp.sum(grad) * 1e-9

    def simp_grad(labels, x, ll, gl):
        loss, grad = jax.value_and_grad(
            lambda y: jnp.mean(simplified_ctc_loss(labels, y, ll, gl, 0))
        )(x)
        return loss + jnp.sum(grad) * 1e-9

    def ctx_only(labels, x, ll, gl):
        lp = logit_to_logproba(x, 2)
        ctx = core.make_context(labels, lp, ll, gl, 0)
        from tf_seq2seq_losses_tpu.ops.core import expected_token_lp

        return jnp.sum(expected_token_lp(ctx)) * 1e-9 + jnp.sum(ctx.blank_lp) * 1e-9

    def alpha_k(labels, x, ll, gl):
        lp = logit_to_logproba(x, 2)
        ctx = core.make_context(labels, lp, ll, gl, 0)
        fin = pal.classic_alpha_final(ctx)
        return jnp.sum(jnp.where(jnp.isfinite(fin), fin, 0.0)) * 1e-9

    def alpha_full(labels, x, ll, gl):
        lp = logit_to_logproba(x, 2)
        ctx = core.make_context(labels, lp, ll, gl, 0)
        a = pal.classic_alpha(ctx)
        return jnp.sum(jnp.where(jnp.isfinite(a), a, 0.0)) * 1e-9

    def alpha_beta(labels, x, ll, gl):
        lp = logit_to_logproba(x, 2)
        ctx = core.make_context(labels, lp, ll, gl, 0)
        a = pal.classic_alpha(ctx)
        b = pal.classic_beta(ctx)
        return (
            jnp.sum(jnp.where(jnp.isfinite(a), a, 0.0))
            + jnp.sum(jnp.where(jnp.isfinite(b), b, 0.0))
        ) * 1e-9

    def grad_raw(labels, x, ll, gl):
        lp = logit_to_logproba(x, 2)
        ctx = core.make_context(labels, lp, ll, gl, 0)
        a = pal.classic_alpha(ctx)
        b = pal.classic_beta(ctx)
        loss = classic_mod.loss(ctx, a)
        g = core.gradient(
            type("T", (), {"alpha": lambda c: a, "beta": lambda c: b,
                           "combine": classic_mod.combine})(), ctx, loss
        )
        return jnp.sum(g) * 1e-9

    for name, body in [
        ("ctx_only", ctx_only),
        ("alpha_final(fwd loss path)", alpha_k),
        ("alpha_full", alpha_full),
        ("alpha+beta_full", alpha_beta),
        ("fwd_only loss", fwd_only),
        ("fwd+grad classic", fwd_grad),
        ("fwd+grad simplified", simp_grad),
    ]:
        ms = timeit(loop(body), args)
        print(f"{name:32s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
