import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from tf_seq2seq_losses_tpu.ops import core, pallas_lattice as pk
from tf_seq2seq_losses_tpu.utils.config import config_override
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

BATCH, MAX_T, VOCAB = 256, 500, 32
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, VOCAB, (BATCH, MAX_T // 2)).astype(np.int32))
logits = jnp.asarray(rng.randn(BATCH, MAX_T, VOCAB).astype(np.float32))
ll = jnp.asarray(rng.randint(MAX_T // 4, MAX_T // 2, (BATCH,)).astype(np.int32))
gl = jnp.asarray(rng.randint(MAX_T // 2, MAX_T, (BATCH,)).astype(np.int32))
lp = logit_to_logproba(logits, 2)


def timeit(fn, n_hi=16, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(lp_, n):
        def body(i, acc):
            x = lp_ + acc * 0.0 + i.astype(jnp.float32) * 1e-6
            c = core.make_context(labels, x, ll, gl, 0)
            return acc + fn(c)
        return jax.lax.fori_loop(0, n, body, 0.0)
    f1 = lambda: loop(lp, n=1); fn_ = lambda: loop(lp, n=n_hi)
    float(f1()); float(fn_())
    def best(f):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(f()); vals.append(time.perf_counter() - t0)
        return min(vals)
    return (best(fn_) - best(f1)) / (n_hi - 1) * 1e3

gfn = lambda c: jnp.sum(jnp.where(jnp.isfinite(pk.classic_gradient_log_with_loss(c, None)[0]),
                                  pk.classic_gradient_log_with_loss(c, None)[0], 0.0)) * 1e-9
lfn = lambda c: jnp.sum(pk.classic_loss_fast(c)) * 1e-9

for bb, bt in [(32, 8), (64, 8), (32, 16), (64, 16), (32, 32), (128, 8)]:
    with config_override(block_batch=bb, block_time=bt):
        try:
            g = timeit(gfn)
            l = timeit(lfn)
            print(f"bb={bb:<4d}bt={bt:<4d} grad={g:7.3f} ms  loss={l:7.3f} ms", flush=True)
        except Exception as e:
            print(f"bb={bb:<4d}bt={bt:<4d} FAIL {str(e)[:80]}", flush=True)
