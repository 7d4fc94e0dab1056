import os, sys, time, functools
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

lp1 = labels.shape[1] + 1
lpad = 256

def stage_prep(c):
    bb, bt = pk._fit_blocks(lpad, 10, MAX_T, BATCH)
    bpad = pk._round_up(BATCH, bb); tpad = pk._round_up(MAX_T, bt)
    blank, dc, pt, nb, rep, ohl, ohp = pk._classic_padded_inputs(c, bpad, tpad, lpad)
    return (jnp.sum(blank) + jnp.sum(dc[:, 0]) + jnp.sum(pt[:, 0]) + jnp.sum(ohl[:, 0]) + jnp.sum(ohp[:, 0])) * 1e-9

def stage_alpha(c):
    bb, bt = pk._fit_blocks(lpad, 10, MAX_T, BATCH)
    bpad = pk._round_up(BATCH, bb); tpad = pk._round_up(MAX_T, bt)
    blank, dc, pt, nb, rep, ohl, ohp = pk._classic_padded_inputs(c, bpad, tpad, lpad)
    a0, a1, ae = pk._classic_fwd_call(blank, dc, pt, nb, rep, mode="pre", bb=bb, bt=bt)
    return (jnp.sum(a0[:, -1]) + jnp.sum(a1[:, -1]) + jnp.sum(ae[:, -1]) * 1e-9) * 1e-9

def stage_bwd(c):
    bb, bt = pk._fit_blocks(lpad, 10, MAX_T, BATCH)
    bpad = pk._round_up(BATCH, bb); tpad = pk._round_up(MAX_T, bt)
    blank, dc, pt, nb, rep, ohl, ohp = pk._classic_padded_inputs(c, bpad, tpad, lpad)
    a0, a1, ae = pk._classic_fwd_call(blank, dc, pt, nb, rep, mode="pre", bb=bb, bt=bt)
    init_lane = (pk._lane_iota((bpad, lpad)) == jnp.pad(c.label_length, (0, bpad - BATCH))[:, None]).astype(jnp.float32)
    ph, pd, ab, ga, gd, fin, fe = pk._classic_bwd_call(blank, dc, pt, nb, rep, a0, a1, ae, init_lane, bb=bb, bt=bt)
    return (jnp.sum(ph[:, 0]) + jnp.sum(pd[:, 0]) + jnp.sum(ab[:, 0]) + jnp.sum(ga[:, 0]) + jnp.sum(gd[:, 0]) + jnp.sum(fin)) * 1e-9

def stage_full(c):
    g, l2 = pk.classic_gradient_log_with_loss(c, None)
    return jnp.sum(jnp.where(jnp.isfinite(g), g, 0.0)) * 1e-9

print(f"prep:        {timeit(stage_prep):7.3f} ms", flush=True)
print(f"+alpha_pre:  {timeit(stage_alpha):7.3f} ms", flush=True)
print(f"+bwd:        {timeit(stage_bwd):7.3f} ms", flush=True)
print(f"full grad:   {timeit(stage_full):7.3f} ms", flush=True)
