import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from tf_seq2seq_losses_tpu.ops import core, pallas_lattice as pk
from tf_seq2seq_losses_tpu.ops import classic as cm
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

def check(B, T, V, Lmax, seed=0):
    rng = np.random.RandomState(seed)
    labels = jnp.asarray(rng.randint(1, V, (B, Lmax)).astype(np.int32))
    logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    ll = jnp.asarray(rng.randint(max(Lmax//2,1), Lmax+1, (B,)).astype(np.int32))
    gl = jnp.asarray(rng.randint(max(T//2,1), T+1, (B,)).astype(np.int32))
    lp = logit_to_logproba(logits, 2)
    ctx = core.make_context(labels, lp, ll, gl, 0)
    pure = cm.loss(ctx, cm.alpha(ctx))
    fast = jax.jit(pk.classic_loss_fast)(ctx)
    p, f = np.asarray(pure), np.asarray(fast)
    bad = (~np.isfinite(f)) & np.isfinite(p)
    err = np.nanmax(np.abs(np.where(np.isfinite(f) & np.isfinite(p), f - p, 0)))
    print(f"B={B:<4d}T={T:<4d}V={V:<3d}L={Lmax:<4d} bad={bad.sum():<4d} maxerr={err:.5f}", flush=True)

check(4, 9, 5, 4)       # tiny (worked)
check(4, 40, 5, 10)     # multiple time blocks
check(4, 40, 5, 120)    # lpad=128, bigger L
check(4, 40, 5, 140)    # lpad=256
check(64, 40, 5, 140)   # bb=64
check(64, 200, 32, 100) # deeper decay
check(256, 500, 32, 250)  # bench shape
