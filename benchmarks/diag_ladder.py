"""Tier-ladder A/B on the chip: (repair_bucket, repair_bucket2) in
{(16,32), (32,64)} x n_flushed in {0,1,20,40}.

Hypothesis (r5): the tier-1 pure mini-repair is a 500-step sequential
``lax.scan`` over <=bucket rows — latency-bound, so pure(32) ~ pure(16);
raising bucket to 32 covers the 17-32-flushed band at the ~1.3x tier-1
cost instead of tier-2's 0.85 ms fixed + ~35 us/row log-kernel gather.
State is rebuilt per measurement (no cross-config mutation).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

B, T, V = 256, 500, 32


def make_args(n_sat):
    rng = np.random.RandomState(0)
    labels = rng.randint(1, V, (B, T // 2)).astype(np.int32)
    logits = rng.randn(B, T, V).astype(np.float32)
    ll = rng.randint(T // 4, T // 2, (B,)).astype(np.int32)
    gl = rng.randint(T // 2, T, (B,)).astype(np.int32)
    for b in range(n_sat):
        logits[b] = 0.0
        logits[b, :, 3] = 100.0
        labels[b, 0] = 1
        ll[b] = 1
    return (jnp.asarray(labels), jnp.asarray(logits), jnp.asarray(ll),
            jnp.asarray(gl))


def timed(args, n_hi=8, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def loop(labels_, logits_, ll_, gl_, n):
        def body(i, acc):
            x = logits_ + acc * 0.0 + i.astype(jnp.float32) * 1e-6

            def f(y):
                out = classic_ctc_loss(labels_, y, ll_, gl_, 0)
                return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

            loss, grad = jax.value_and_grad(f)(x)
            return acc + loss + jnp.sum(grad) * 1e-9

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(*args, n=1))
    float(loop(*args, n=n_hi))

    def best(n):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(*args, n=n))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(n_hi) - best(1)) / (n_hi - 1) * 1e3


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for b1, b2 in ((16, 32), (32, 64)):
        with config_override(repair_bucket=b1, repair_bucket2=b2):
            clean = timed(make_args(0))
            print(f"bucket={b1}/{b2} clean: {clean:7.3f} ms", flush=True)
            for n in (1, 20, 40):
                ms = timed(make_args(n))
                print(f"bucket={b1}/{b2} n={n:<3d}: {ms:7.3f} ms "
                      f"({ms / clean:.2f}x)", flush=True)
