"""Probe: per-sample batched dot_general inside a Mosaic kernel.

The round-2 kernel redesign wants two in-kernel contractions per time-block:

  prep:    dc[b, t, l] = sum_v probs[b, t, v] * oh[b, v, l]   (b batched)
  scatter: out[b, t, v] = sum_l acts[b, t, l] * oh2[b, l, v]  (b batched)

Both are per-sample small matmuls (M=bt, K/N in {V, Lpad}).  This probe
answers: (1) does Mosaic compile a batch-dim dot_general at all, (2) what
does it cost per invocation vs. the same einsum in XLA, and (3) what does a
V-unrolled VPU broadcast-FMA version cost.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB, BT, V, LPAD = 64, 16, 32, 256
NB, NT = 4, 32  # grid: like B=256, T=512


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_inputs(seed=0):
    r = np.random.RandomState(seed)
    probs = jnp.asarray(r.rand(NB * BB, NT * BT, V).astype(np.float32))
    oh = jnp.asarray(r.rand(NB * BB, V, LPAD).astype(np.float32))
    return probs, oh


# --- kernel 1: batched dot_general ----------------------------------------
def dot_kernel(p_ref, oh_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        p_ref[:], oh_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def run_dot(probs, oh):
    return pl.pallas_call(
        dot_kernel,
        grid=(NB, NT),
        in_specs=[
            pl.BlockSpec((BB, BT, V), lambda i, j: (i, j, 0)),
            pl.BlockSpec((BB, V, LPAD), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BB, BT, LPAD), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((NB * BB, NT * BT, LPAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(probs, oh)


# --- kernel 2: V-unrolled broadcast FMA -----------------------------------
def fma_kernel(p_ref, oh_ref, o_ref):
    acc = jnp.zeros((BB, BT, LPAD), jnp.float32)
    for v in range(V):
        acc = acc + p_ref[:, :, v][:, :, None] * oh_ref[:, v, :][:, None, :]
    o_ref[:] = acc


def run_fma(probs, oh):
    return pl.pallas_call(
        fma_kernel,
        grid=(NB, NT),
        in_specs=[
            pl.BlockSpec((BB, BT, V), lambda i, j: (i, j, 0)),
            pl.BlockSpec((BB, V, LPAD), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BB, BT, LPAD), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((NB * BB, NT * BT, LPAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(probs, oh)


@jax.jit
def run_einsum(probs, oh):
    return jnp.einsum("btv,bvl->btl", probs, oh,
                      precision=jax.lax.Precision.HIGHEST)


# --- scatter direction: [bb,bt,LPAD] @ [bb,LPAD,V] -------------------------
def scat_kernel(a_ref, oh_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], oh_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def run_scat(acts, oh2):
    return pl.pallas_call(
        scat_kernel,
        grid=(NB, NT),
        in_specs=[
            pl.BlockSpec((BB, BT, LPAD), lambda i, j: (i, j, 0)),
            pl.BlockSpec((BB, LPAD, V), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BB, BT, V), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((NB * BB, NT * BT, V), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(acts, oh2)


if __name__ == "__main__":
    print("devices:", jax.devices())
    probs, oh = make_inputs()
    ref = run_einsum(probs, oh)

    for name, fn in [("batched_dot", run_dot), ("vpu_fma", run_fma)]:
        try:
            out = fn(probs, oh)
            err = float(jnp.max(jnp.abs(out - ref)))
            ms = timeit(fn, probs, oh)
            print(f"{name}: OK  max_err={err:.2e}  {ms:.3f} ms")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
    print(f"einsum (XLA): {timeit(run_einsum, probs, oh):.3f} ms")

    r = np.random.RandomState(1)
    acts = jnp.asarray(r.rand(NB * BB, NT * BT, LPAD).astype(np.float32))
    oh2 = jnp.asarray(r.rand(NB * BB, LPAD, V).astype(np.float32))
    ref2 = jnp.einsum("btl,blv->btv", acts, oh2,
                      precision=jax.lax.Precision.HIGHEST)
    try:
        out2 = run_scat(acts, oh2)
        err2 = float(jnp.max(jnp.abs(out2 - ref2)))
        ms2 = timeit(run_scat, acts, oh2)
        print(f"scatter batched_dot: OK  max_err={err2:.2e}  {ms2:.3f} ms")
    except Exception as e:
        print(f"scatter batched_dot: FAIL {type(e).__name__}: {str(e)[:300]}")
