"""Saturation-repair cost: clean batch vs 1 saturated sample vs bucket+1.

VERDICT r1 next-round #4 target: a batch with one saturated sample costs
<= 1.5x the clean-batch fwd+grad time.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss

B, T, V = 256, 500, 32
rng = np.random.RandomState(0)
labels = rng.randint(1, V, (B, T // 2)).astype(np.int32)
logits = rng.randn(B, T, V).astype(np.float32)
ll = rng.randint(T // 4, T // 2, (B,)).astype(np.int32)
gl = rng.randint(T // 2, T, (B,)).astype(np.int32)


def saturate(logits_np, rows):
    """Wrong-certain predictions: feasible but flushes f32 prob space
    (reference stability case, test_classic_ctc_loss.py:285-307)."""
    out = logits_np.copy()
    for b in rows:
        out[b] = 0.0
        out[b, :, 3] = 100.0
        labels[b, 0] = 1
        ll[b] = 1
    return out


def timed(logits_np, n_hi=8, reps=3):
    args = (jnp.asarray(labels), jnp.asarray(logits_np), jnp.asarray(ll),
            jnp.asarray(gl))

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
    clean_ms = timed(logits)
    print(f"clean batch:        {clean_ms:.3f} ms", flush=True)
    one_ms = timed(saturate(logits, [7]))
    print(f"1 saturated sample: {one_ms:.3f} ms ({one_ms / clean_ms:.2f}x, "
          f"target <= 1.5x)", flush=True)
    many_ms = timed(saturate(logits, range(20)))
    print(f"20 saturated (> bucket, tier-2 gathered log-kernel repair): "
          f"{many_ms:.3f} ms ({many_ms / clean_ms:.2f}x)", flush=True)
    mid_ms = timed(saturate(logits, range(40)))
    print(f"40 saturated (> bucket2, whole-batch log-kernel reroute): "
          f"{mid_ms:.3f} ms ({mid_ms / clean_ms:.2f}x)", flush=True)
    most_ms = timed(saturate(logits, range(80)))
    print(f"80 saturated (> bucket2, whole-batch log-kernel reroute): "
          f"{most_ms:.3f} ms ({most_ms / clean_ms:.2f}x)", flush=True)
