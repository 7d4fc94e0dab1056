"""Block-geometry sweep for the v3 kernels on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override

B, T, V = 256, 500, 32
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, T // 2)).astype(np.int32))
logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
ll = jnp.asarray(rng.randint(T // 4, T // 2, (B,)).astype(np.int32))
gl = jnp.asarray(rng.randint(T // 2, T, (B,)).astype(np.int32))


def timed(fn, n_hi=12, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def loop(x0, n):
        def body(i, acc):
            x = x0 + acc * 0.0 + i.astype(jnp.float32) * 1e-6
            return acc + fn(x) * 1e-9

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(logits, n=1))
    float(loop(logits, n=n_hi))

    def best(n):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(logits, n=n))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(n_hi) - best(1)) / (n_hi - 1) * 1e3


def grad_fn(x):
    loss, grad = jax.value_and_grad(
        lambda y: jnp.mean(classic_ctc_loss(labels, y, ll, gl, 0))
    )(x)
    return loss + jnp.sum(grad) * 1e-9


if __name__ == "__main__":
    os.environ["CTC_TPU_VMEM_BUDGET_MB"] = os.environ.get(
        "CTC_TPU_VMEM_BUDGET_MB", "64"
    )
    combos = os.environ.get(
        "SWEEP", "64x8,32x16,64x16,16x32,32x32,8x96"
    ).split(",")
    for combo in combos:
        bb, bt = map(int, combo.split("x"))
        try:
            with config_override(block_batch=bb, block_time=bt, guard=False):
                # new jit cache per config: closure identity changes per loop call
                ms = timed(lambda x, _bb=bb: grad_fn(x))
            print(f"bb={bb} bt={bt}: {ms:.3f} ms", flush=True)
        except Exception as e:
            print(f"bb={bb} bt={bt}: FAIL {type(e).__name__} {str(e)[:160]}",
                  flush=True)
