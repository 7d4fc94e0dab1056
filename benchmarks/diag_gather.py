"""Feasibility microbench: per-sample one-hot build + MXU dot inside a kernel
(the in-kernel gather that would replace the [B,T,L] transition tensors).

VERDICT (v5e, B=256 T=504): in-kernel per-sample loop 1.7 ms vs 0.13 ms for
the batched XLA einsum — the per-sample dot loop is ~13x slower, so gathers
stay in XLA (the batched one-hot matmul) by design.  (The parity flag in
this probe is cosmetic; the timing conclusion stands.)"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, VP, LP = 256, 504, 128, 256
BB, BT = 32, 8
rng = np.random.RandomState(0)
probs = jnp.asarray(rng.rand(B, T, VP).astype(np.float32))
labels = jnp.asarray(rng.randint(0, 32, (B, LP)).astype(np.int32))


def kernel(probs_ref, lab_ref, out_ref):
    def body(s, _):
        lab_row = lab_ref[s, :]  # [LP]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (VP, LP), 0)
        onehot = (iota_v == lab_row[None, :]).astype(jnp.float32)  # [VP, LP]
        out_ref[s, :, :] = jax.lax.dot_general(
            probs_ref[s, :, :], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, BB, body, 0)


@jax.jit
def run(probs, labels):
    return pl.pallas_call(
        kernel,
        grid=(B // BB, T // BT),
        in_specs=[
            pl.BlockSpec((BB, BT, VP), lambda i, j: (i, j, 0)),
            pl.BlockSpec((BB, LP), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BB, BT, LP), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, LP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(probs, labels)


@jax.jit
def run_xla(probs, labels):
    onehot = (labels[:, :, None] == jnp.arange(VP)[None, None, :]).astype(jnp.float32)
    return jnp.einsum("btv,blv->btl", probs, onehot,
                      precision=jax.lax.Precision.HIGHEST)


def timeit(f, n_hi=16, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(p, lab, n):
        def body(i, acc):
            x = p + acc * 0.0 + i.astype(jnp.float32) * 1e-9
            return acc + jnp.sum(f(x, lab)[:, 0]) * 1e-9
        return jax.lax.fori_loop(0, n, body, 0.0)
    f1 = lambda: loop(probs, labels, n=1); fn_ = lambda: loop(probs, labels, n=n_hi)
    float(f1()); float(fn_())
    def best(g):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(g()); vals.append(time.perf_counter() - t0)
        return min(vals)
    return (best(fn_) - best(f1)) / (n_hi - 1) * 1e3

o1 = run(probs, labels); o2 = run_xla(probs, labels)
print("parity:", bool(np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)))
print(f"in-kernel gather: {timeit(run):7.3f} ms")
print(f"XLA einsum:       {timeit(run_xla):7.3f} ms")
