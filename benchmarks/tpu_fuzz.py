"""Compiled-kernel geometry fuzz on the real chip: pallas vs pure parity."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from tf_seq2seq_losses_tpu import classic_ctc_loss, simplified_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override

CASES = [
    (5, 9, 5, 9, 0),
    (3, 17, 6, 16, 2),
    (2, 11, 5, 127, 3),
    (2, 11, 5, 128, 4),
    (1, 31, 3, 7, 5),
    (7, 40, 8, 20, 6),
    (4, 65, 6, 30, 7),    # T crosses several window/block boundaries
    (3, 23, 9, 129, 8),   # Lp1 just over the lane tile
    (6, 12, 4, 6, 9),     # short labels, tight feasibility
    # every logit_length far below the padded T: the top time blocks are
    # wholly past max(lens), exercising the forced top-block residual
    # write/read pair of the streamed kernels (interpret mode zero-fills
    # buffers, so only the compiled chip can catch an uninitialised read)
    (5, 64, 5, 12, 10, 9),
]
ok = True
for case in CASES:
    batch, max_t, vocab, max_l, seed = case[:5]
    gl_cap = case[5] if len(case) > 5 else max_t
    rand = np.random.RandomState(seed)
    labels = jnp.asarray(rand.randint(1, vocab, (batch, max_l)).astype(np.int32))
    logits = jnp.asarray(rand.randn(batch, max_t, vocab).astype(np.float32))
    ll = jnp.asarray(rand.randint(1, max_l + 1, (batch,)).astype(np.int32))
    gl = jnp.asarray(rand.randint(1, gl_cap + 1, (batch,)).astype(np.int32))
    for name, fn in (("classic", classic_ctc_loss), ("simplified", simplified_ctc_loss)):
        def scalar(x, fn=fn):
            out = fn(labels, x, ll, gl, 0)
            return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))
        lf = jax.jit(lambda x, fn=fn: fn(labels, x, ll, gl, 0))(logits)
        gf = jax.jit(jax.grad(scalar))(logits)
        with config_override(use_pallas=False):
            lp = jax.jit(lambda x, fn=fn: fn(labels, x, ll, gl, 0))(logits)
            gp = jax.jit(jax.grad(scalar))(logits)
        le = np.nanmax(np.abs(np.where(np.isfinite(lf) & np.isfinite(lp), np.asarray(lf) - np.asarray(lp), 0)))
        ge = np.max(np.abs(np.asarray(gf) - np.asarray(gp)))
        inf_match = bool((np.isposinf(np.asarray(lf)) == np.isposinf(np.asarray(lp))).all())
        # Tolerances: the block-float product accumulates ~T*eps relative
        # error on the loss (5e-6 at these shapes); gradients are
        # exp(loss + combined), so that relative error reappears as an
        # absolute gradient error of ~|grad| * loss_rel_err (~1e-4).
        status = "OK " if (le < 5e-4 and ge < 5e-4 and inf_match) else "FAIL"
        ok &= status == "OK "
        print(f"{status} B={batch} T={max_t} L={max_l} {name:10s} loss_err={le:.2e} grad_err={ge:.2e} inf_match={inf_match}", flush=True)
print("ALL OK" if ok else "FAILURES")
