"""Block-size sweep + pure-XLA comparison for the classic grad path on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override

BATCH, MAX_T, VOCAB = 256, 500, 32


def make_inputs(batch, max_t, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randint(1, vocab, (batch, max_t // 2)).astype(np.int32)),
        jnp.asarray(rng.randn(batch, max_t, vocab).astype(np.float32)),
        jnp.asarray(rng.randint(max_t // 4, max_t // 2, (batch,)).astype(np.int32)),
        jnp.asarray(rng.randint(max_t // 2, max_t, (batch,)).astype(np.int32)),
    )


def measure(args, n_hi=16, reps=3):
    labels, logits, label_length, logit_length = args

    def body(i, acc):
        x = logits + acc * 0.0 + i.astype(jnp.float32) * 1e-6
        loss, g = jax.value_and_grad(
            lambda y: jnp.mean(classic_ctc_loss(labels, y, label_length, logit_length, 0))
        )(x)
        return acc + loss + jnp.sum(g) * 1e-9

    @jax.jit
    def run_1():
        return jax.lax.fori_loop(0, 1, body, 0.0)

    @jax.jit
    def run_n():
        return jax.lax.fori_loop(0, n_hi, body, 0.0)

    float(run_1()); float(run_n())

    def best(f):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(f()); vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(run_n) - best(run_1)) / (n_hi - 1) * 1e3


def main():
    args = make_inputs(BATCH, MAX_T, VOCAB)
    with config_override(use_pallas=False):
        ms = measure(args)
        print(f"pure-XLA lax.scan path              {ms:8.3f} ms")
    for bb, bt in [(64, 16), (64, 64), (128, 32), (256, 32), (32, 32), (256, 125)]:
        with config_override(use_pallas=True, block_batch=bb, block_time=bt):
            ms = measure(args)
            print(f"pallas bb={bb:<4d} bt={bt:<4d}            {ms:8.3f} ms")


if __name__ == "__main__":
    main()
