"""Time the prob-terms prep (exp+einsums+pads) separately from the kernel."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from tf_seq2seq_losses_tpu.ops import core, pallas_lattice as pk
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

BATCH, MAX_T, VOCAB = 256, 500, 32
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, VOCAB, (BATCH, MAX_T // 2)).astype(np.int32))
logits = jnp.asarray(rng.randn(BATCH, MAX_T, VOCAB).astype(np.float32))
ll = jnp.asarray(rng.randint(MAX_T // 4, MAX_T // 2, (BATCH,)).astype(np.int32))
gl = jnp.asarray(rng.randint(MAX_T // 2, MAX_T, (BATCH,)).astype(np.int32))
lp = logit_to_logproba(logits, 2)


def timeit(fn, n_hi=16, reps=3):
    f1 = jax.jit(lambda: fn(1)); fn_ = jax.jit(lambda: fn(n_hi))
    float(f1()); float(fn_())
    def best(f):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(f()); vals.append(time.perf_counter() - t0)
        return min(vals)
    return (best(fn_) - best(f1)) / (n_hi - 1) * 1e3


def prep_loop(n):
    def body(i, acc):
        x = lp + acc * 0.0 + i.astype(jnp.float32) * 1e-6
        c = core.make_context(labels, x, ll, gl, 0)
        t = pk._classic_prob_terms(c)
        return acc + (jnp.sum(t.blank) + jnp.sum(t.prev_masked[:, 0])
                      + jnp.sum(t.diag_closed[:, 0]) + jnp.sum(t.diag_open[:, 0])
                      + jnp.sum(t.prev_plain[:, 0])) * 1e-9
    return jax.lax.fori_loop(0, n, body, 0.0)


def prep_pad_loop(n):
    def body(i, acc):
        x = lp + acc * 0.0 + i.astype(jnp.float32) * 1e-6
        c = core.make_context(labels, x, ll, gl, 0)
        t = pk._classic_prob_terms(c)
        s = 0.0
        for arr in (t.prev_masked, t.diag_closed, t.diag_open):
            p = pk._pad3(arr, 256, 504, 256, 0.0)
            s = s + jnp.sum(p[:, -1]) * 1e-9
        return acc + s
    return jax.lax.fori_loop(0, n, body, 0.0)


print(f"prob terms prep only:      {timeit(prep_loop):7.3f} ms", flush=True)
print(f"prob terms prep + 3 pads:  {timeit(prep_pad_loop):7.3f} ms", flush=True)
