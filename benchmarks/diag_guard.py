"""Diagnose: does the guard fire at bench shape? How fast is the raw prob path?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.ops import core, pallas_lattice as pk
from tf_seq2seq_losses_tpu.ops.topology import _classic_feasible
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


def timeit(fn, n_hi=16, reps=3):
    f1 = jax.jit(lambda: fn(1))
    fn_ = jax.jit(lambda: fn(n_hi))
    float(f1()); float(fn_())

    def best(f):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(f()); vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(fn_) - best(f1)) / (n_hi - 1) * 1e3


def main():
    labels, logits, ll, gl = make_inputs(BATCH, MAX_T, VOCAB)
    lp = logit_to_logproba(logits, 2)
    ctx = core.make_context(labels, lp, ll, gl, 0)

    fast = jax.jit(pk.classic_loss_fast)(ctx)
    feas = _classic_feasible(ctx)
    flushed = np.asarray(~jnp.isfinite(fast) & feas)
    print(f"flushed samples: {flushed.sum()}/{BATCH}, "
          f"loss range finite: [{np.nanmin(np.where(np.isfinite(fast), fast, np.nan)):.1f}, "
          f"{np.nanmax(np.where(np.isfinite(fast), fast, np.nan)):.1f}]")

    def loss_loop(n):
        def body(i, acc):
            x = lp + acc * 0.0 + i.astype(jnp.float32) * 1e-6
            c = core.make_context(labels, x, ll, gl, 0)
            return acc + jnp.sum(pk.classic_loss_fast(c)) * 1e-9
        return jax.lax.fori_loop(0, n, body, 0.0)

    print(f"raw prob loss_fast: {timeit(loss_loop):.3f} ms")

    def grad_loop(n):
        def body(i, acc):
            x = lp + acc * 0.0 + i.astype(jnp.float32) * 1e-6
            c = core.make_context(labels, x, ll, gl, 0)
            g, l2 = pk.classic_gradient_log_with_loss(c, None)
            return acc + jnp.sum(jnp.where(jnp.isfinite(g), g, 0.0)) * 1e-9
        return jax.lax.fori_loop(0, n, body, 0.0)

    print(f"raw prob grad_log:  {timeit(grad_loop):.3f} ms")


if __name__ == "__main__":
    main()


def strip_rescale_timing():
    """Timing variant with rescale stripped (numerics invalid, timing valid)."""
    import tf_seq2seq_losses_tpu.ops.pallas_lattice as pk2

    pk2._rescale2 = lambda a0, a1, ls: (a0, a1, ls)
    pk2._rescale1 = lambda a, ls: (a, ls)
    labels, logits, ll, gl = make_inputs(BATCH, MAX_T, VOCAB)
    lp = logit_to_logproba(logits, 2)

    def loss_loop(n):
        def body(i, acc):
            x = lp + acc * 0.0 + i.astype(jnp.float32) * 1e-6
            c = core.make_context(labels, x, ll, gl, 0)
            return acc + jnp.sum(pk2.classic_loss_fast(c)) * 1e-9
        return jax.lax.fori_loop(0, n, body, 0.0)

    print(f"no-rescale loss_fast: {timeit(loss_loop):.3f} ms")


if __name__ == "__main__" and os.environ.get("STRIP"):
    strip_rescale_timing()
