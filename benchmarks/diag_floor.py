"""Pallas floor: same grid/specs as the fwd kernel, trivial vs real body."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, L = 256, 504, 256
BB, BT = 64, 8
rng = np.random.RandomState(0)
blank = jnp.asarray(rng.rand(B, T, 1).astype(np.float32))
pm = jnp.asarray(rng.rand(B, T, L).astype(np.float32))
dc = jnp.asarray(rng.rand(B, T, L).astype(np.float32))
do = jnp.asarray(rng.rand(B, T, L).astype(np.float32))


def make(body_kind):
    def kernel(blank_ref, pm_ref, dc_ref, do_ref, f0, f1, a0_s, a1_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            a0_s[:] = jnp.ones(a0_s.shape, jnp.float32)
            a1_s[:] = jnp.zeros(a1_s.shape, jnp.float32)

        def step(k, _):
            blank_v = blank_ref[:, k, :]
            a0 = a0_s[:]
            a1 = a1_s[:]
            if body_kind == "empty":
                a0_s[:] = a0 * 0.999
            elif body_kind == "loads":
                v = pm_ref[:, k, :] + dc_ref[:, k, :] + do_ref[:, k, :]
                a0_s[:] = a0 * 0.999 + v * 1e-9
            elif body_kind == "noroll":
                d = a0 * dc_ref[:, k, :] + a1 * do_ref[:, k, :]
                n0 = (a0 + a1) * blank_v
                n1 = a1 * pm_ref[:, k, :] + d
                a0_s[:] = n0
                a1_s[:] = n1
            elif body_kind == "full":
                d = a0 * dc_ref[:, k, :] + a1 * do_ref[:, k, :]
                d = pltpu.roll(d, shift=1, axis=1)
                n0 = (a0 + a1) * blank_v
                n1 = a1 * pm_ref[:, k, :] + d
                a0_s[:] = n0
                a1_s[:] = n1
            return 0

        jax.lax.fori_loop(0, BT, step, 0)
        f0[:] = a0_s[:]
        f1[:] = a1_s[:]

    grid = (B // BB, T // BT)
    big = pl.BlockSpec((BB, BT, L), lambda i, j: (i, j, 0))
    small = pl.BlockSpec((BB, BT, 1), lambda i, j: (i, j, 0))
    fin = pl.BlockSpec((BB, L), lambda i, j: (i, 0))

    @jax.jit
    def run(blank, pm, dc, do):
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[small, big, big, big],
            out_specs=(fin, fin),
            out_shape=(jax.ShapeDtypeStruct((B, L), jnp.float32),) * 2,
            scratch_shapes=[pltpu.VMEM((BB, L), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        )(blank, pm, dc, do)

    return run


def timeit(run, n_hi=16, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(blank, pm, dc, do, n):
        def body(i, acc):
            out = run(blank + acc * 0.0 + i.astype(jnp.float32) * 1e-9, pm, dc, do)
            return acc + jnp.sum(out[0]) * 1e-9
        return jax.lax.fori_loop(0, n, body, 0.0)
    f1 = lambda: loop(blank, pm, dc, do, n=1)
    fn_ = lambda: loop(blank, pm, dc, do, n=n_hi)
    float(f1()); float(fn_())
    def best(f):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(f()); vals.append(time.perf_counter() - t0)
        return min(vals)
    return (best(fn_) - best(f1)) / (n_hi - 1) * 1e3


for kind in ["empty", "loads", "noroll", "full"]:
    print(f"{kind:8s} {timeit(make(kind)):7.3f} ms", flush=True)
