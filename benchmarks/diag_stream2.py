"""Kernel-isolation A/B for the streamed-residual scheme (r3).

Times each kernel alone: fwd(final/bound/resid), bwd(recompute/streamed).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu.ops import core as core_mod
from tf_seq2seq_losses_tpu.ops import pallas_lattice as pk
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

B, T, V = 256, 500, 32
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, T // 2)).astype(np.int32))
logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
ll = jnp.asarray(rng.randint(T // 4, T // 2, (B,)).astype(np.int32))
gl = jnp.asarray(rng.randint(T // 2, T, (B,)).astype(np.int32))
ctx = core_mod.make_context(labels, logit_to_logproba(logits, 2), ll, gl, 0)

bpad, tpad, lpad, bb, bt = pk._grad_geometry(B, T, ctx.label.shape[1])[:5]
print(f"geometry: bpad={bpad} tpad={tpad} lpad={lpad} bb={bb} bt={bt} "
      f"k_win={pk._k_win(bt)}", flush=True)

blank, dcpt, nb, rep, ohl, ohp = jax.jit(
    lambda c: pk._classic_padded_inputs(c, bpad, tpad, lpad)
)(ctx)
jax.block_until_ready(dcpt)
dc = dcpt

bnd = jax.jit(
    lambda *a: pk._classic_fwd_call(*a, mode="bound", bb=bb, bt=bt)
)(blank, dcpt, nb, rep)
res = jax.jit(
    lambda *a: pk._classic_fwd_call(*a, mode="resid", bb=bb, bt=bt)
)(blank, dcpt, nb, rep)
jax.block_until_ready(res)
ebi = jnp.zeros((bpad, 1), jnp.float32)
binit = pk._beta_init(ctx, bpad, lpad)
lens = pk._padded_lens(ctx, bpad)


def timed(fn, n_hi=16, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def loop(dc_, n):
        def body(i, acc):
            x = dc_ + acc * 0.0 + i.astype(jnp.float32) * 1e-9
            out = fn(x)
            return acc + jax.tree.leaves(out)[0].reshape(-1)[0] * 1e-9

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(dc, n=1))
    float(loop(dc, n=n_hi))

    def best(n):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(dc, n=n))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(n_hi) - best(1)) / (n_hi - 1) * 1e3


rows = [
    ("fwd final", lambda x: pk._classic_fwd_call(
        blank, x, nb, rep, mode="final", bb=bb, bt=bt)),
    ("fwd bound", lambda x: pk._classic_fwd_call(
        blank, x, nb, rep, mode="bound", bb=bb, bt=bt)),
    ("fwd resid", lambda x: pk._classic_fwd_call(
        blank, x, nb, rep, mode="resid", bb=bb, bt=bt)),
    ("bwd recompute", lambda x: pk._classic_bwd_call(
        blank, x, nb, rep, bnd[0], bnd[1], bnd[2], binit, ebi,
        bb=bb, bt=bt)),
    ("bwd streamed", lambda x: pk._classic_bwd_call_streamed(
        blank, x, nb, rep, res[0], res[1], binit, ebi, lens,
        bb=bb, bt=bt)),
]
for name, fn in rows:
    print(f"{name:<14s}: {timed(fn):7.3f} ms", flush=True)
