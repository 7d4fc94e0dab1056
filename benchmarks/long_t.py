"""Long-sequence memory-envelope proof: B=256, T=4000 fwd+grad on one chip.

Round-1 VERDICT weak #8: the gradient path used to materialise ~7 [B, T, L]
tensors, capping T at ~1500-2000 for B=256 on a 16 GB chip.  The chunked
scan (config.chunk_time) keeps peak memory at O(B*T*V + B*chunk*L).

Reports ms/step at T=500 and T=4000 and the scaling ratio.  CTC work grows
as O(T * L) with L ~ T/2, i.e. quadratically in T when both scale; the
honest comparison is ms normalised by T*Lpad.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss

B, V = int(os.environ.get("LT_B", 256)), 32


def make_inputs(batch, max_t, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randint(1, vocab, (batch, max_t // 2)).astype(np.int32)),
        jnp.asarray(rng.randn(batch, max_t, vocab).astype(np.float32)),
        jnp.asarray(rng.randint(max_t // 4, max_t // 2, (batch,)).astype(np.int32)),
        jnp.asarray(rng.randint(max_t // 2, max_t, (batch,)).astype(np.int32)),
    )


def timed(args, n_hi=4, reps=2):
    @partial(jax.jit, static_argnames=("n",))
    def loop(labels, logits, label_length, logit_length, n):
        def body(i, acc):
            x = logits + acc * 0.0 + i.astype(jnp.float32) * 1e-6

            def mean_finite(y):
                # at long T the random-lengths generator occasionally emits a
                # genuinely infeasible sample (label + forced blanks > logits);
                # its +inf loss / zero grad is correct — mask it from the mean
                out = classic_ctc_loss(labels, y, label_length, logit_length, 0)
                finite = jnp.isfinite(out)
                return jnp.sum(jnp.where(finite, out, 0.0)) / jnp.sum(finite)

            loss, grad = jax.value_and_grad(mean_finite)(x)
            return acc + loss + jnp.sum(grad) * 1e-9

        return jax.lax.fori_loop(0, n, body, 0.0)

    v1 = float(loop(*args, n=1))
    assert np.isfinite(v1), "loss not finite"
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
    rows = []
    for t_len in (500, int(os.environ.get("LT_T", 4000))):
        ms = timed(make_inputs(B, t_len, V))
        lpad = ((t_len // 2 + 1 + 127) // 128) * 128
        rows.append((t_len, ms, ms / (t_len * lpad)))
        print(f"T={t_len}: {ms:.2f} ms/step  (ms per T*Lpad: {rows[-1][2]:.3e})",
              flush=True)
    ratio = rows[-1][2] / rows[0][2]
    print(f"normalised scaling ratio T={rows[-1][0]} vs T=500: {ratio:.3f} "
          f"(<= 1.3 target)", flush=True)
