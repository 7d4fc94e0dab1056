"""Stage-by-stage timing of the v3 gradient pipeline on the real chip.

Serialized fori_loop differencing (same protocol as bench.py) per stage:
  prep   : make_context + padded inputs (einsums)
  fwd_fin: prep + forward final kernel (loss_fast core)
  fwd_bnd: prep + forward bound kernel
  grad   : prep + bound + bwd kernel + scatter + assembly (no guard)
  chain  : public classic_ctc_loss fwd+grad (guard per env)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.ops import core as core_mod
from tf_seq2seq_losses_tpu.ops import pallas_lattice as pk
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

B, T, V = int(os.environ.get("QB_B", 256)), int(os.environ.get("QB_T", 500)), 32
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, T // 2)).astype(np.int32))
logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
ll = jnp.asarray(rng.randint(T // 4, T // 2, (B,)).astype(np.int32))
gl = jnp.asarray(rng.randint(T // 2, T, (B,)).astype(np.int32))


def _ctx(x):
    return core_mod.make_context(labels, logit_to_logproba(x, 2), ll, gl, 0)


def stage_prep(x):
    ctx = _ctx(x)
    bpad, tpad, lpad, bb, bt = pk._grad_geometry(B, T, ctx.label.shape[1])
    blank, dc, pt, nb, rep, ohl, ohp = pk._classic_padded_inputs(
        ctx, bpad, tpad, lpad
    )
    return jnp.sum(dc) + jnp.sum(pt) + jnp.sum(blank)


def stage_fwd_final(x):
    ctx = _ctx(x)
    return jnp.sum(pk._classic_loss_fast_impl(ctx))


def stage_fwd_bound(x):
    ctx = _ctx(x)
    loss, pack = pk._classic_loss_and_pack_impl(ctx)
    return jnp.sum(loss) + jnp.sum(pack[0][0]) * 1e-9


def stage_grad(x):
    ctx = _ctx(x)
    loss, pack = pk._classic_loss_and_pack_impl(ctx)
    out, fast_loss = pk.classic_gradient_log_with_loss(ctx, loss, pack)
    return jnp.sum(jnp.where(jnp.isfinite(out), jnp.exp(out), 0.0))


def stage_chain(x):
    loss, grad = jax.value_and_grad(
        lambda y: jnp.mean(classic_ctc_loss(labels, y, ll, gl, 0))
    )(x)
    return loss + jnp.sum(grad) * 1e-9


def timed(fn, n_hi=16, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def loop(x0, n):
        def body(i, acc):
            x = x0 + acc * 0.0 + i.astype(jnp.float32) * 1e-6
            return acc + fn(x) * 1e-9

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(logits, n=1))
    float(loop(logits, n=n_hi))

    def best(n):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(logits, n=n))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(n_hi) - best(1)) / (n_hi - 1) * 1e3


if __name__ == "__main__":
    from tf_seq2seq_losses_tpu.utils.config import config_override

    which = os.environ.get("QB_STAGES", "prep,fwd_fin,fwd_bnd,grad,chain")
    with config_override(guard=os.environ.get("QB_GUARD", "1") == "1"):
        for name, fn in [
            ("prep", stage_prep),
            ("fwd_fin", stage_fwd_final),
            ("fwd_bnd", stage_fwd_bound),
            ("grad", stage_grad),
            ("chain", stage_chain),
        ]:
            if name in which:
                print(f"{name}: {timed(fn):.3f} ms", flush=True)
