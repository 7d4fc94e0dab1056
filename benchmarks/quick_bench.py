"""Quick headline timing: classic/simplified fwd+grad and fwd-only, TPU."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss

B, T, V = int(os.environ.get("QB_B", 256)), int(os.environ.get("QB_T", 500)), 32


def make_inputs(batch, max_t, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randint(1, vocab, (batch, max_t // 2)).astype(np.int32)),
        jnp.asarray(rng.randn(batch, max_t, vocab).astype(np.float32)),
        jnp.asarray(rng.randint(max_t // 4, max_t // 2, (batch,)).astype(np.int32)),
        jnp.asarray(rng.randint(max_t // 2, max_t, (batch,)).astype(np.int32)),
    )


def timed(loss_fn, args, forward_only=False, n_hi=16, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def loop(labels, logits, label_length, logit_length, n):
        def body(i, acc):
            x = logits + acc * 0.0 + i.astype(jnp.float32) * 1e-6

            def mean_finite(y):
                # mask genuinely infeasible samples (+inf loss): an inf mean
                # would turn acc*0.0 into NaN and poison every later
                # iteration's input, silently flipping the guard's fallback
                # on (the T=250 "anomaly" of round 2)
                out = loss_fn(labels, y, label_length, logit_length, 0)
                finite = jnp.isfinite(out)
                return jnp.sum(jnp.where(finite, out, 0.0)) / jnp.sum(finite)

            if forward_only:
                return acc + mean_finite(x)
            loss, grad = jax.value_and_grad(mean_finite)(x)
            return acc + loss + jnp.sum(grad) * 1e-9

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(*args, n=1))
    float(loop(*args, n=n_hi))

    def best(n):
        return min(
            (lambda t0: (float(loop(*args, n=n)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(reps)
        )

    return (best(n_hi) - best(1)) / (n_hi - 1) * 1e3


if __name__ == "__main__":
    args = make_inputs(B, T, V)
    which = os.environ.get("QB_WHICH", "classic_grad,fwd")
    if "classic_grad" in which:
        print(f"classic fwd+grad B={B} T={T}: {timed(classic_ctc_loss, args):.3f} ms")
    if "simplified_grad" in which:
        print(f"simplified fwd+grad B={B} T={T}: {timed(simplified_ctc_loss, args):.3f} ms")
    if "fwd" in which:
        print(f"classic fwd-only B={B} T={T}: {timed(classic_ctc_loss, args, forward_only=True):.3f} ms")
    if "simplified_fwd" in which:
        print(f"simplified fwd-only B={B} T={T}: {timed(simplified_ctc_loss, args, forward_only=True):.3f} ms")
