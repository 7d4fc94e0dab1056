"""Verify rowmerge-guard correctness on the chip and re-measure the
suspicious r5_guard2 rows (guarded V=32 measured FASTER than guard-off —
physically implausible; guarded V=128 measured worse than the old tiered
guard).  Two timed repeats per row plus a guard-on/off gradient parity
check at both vocabularies."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))

for vocab in (32, 128):
    args = make_inputs(B, T, vocab)

    @jax.jit
    def val_grad(labels, logits, ll, gl):
        def f(x):
            out = classic_ctc_loss(labels, x, ll, gl, 0)
            return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

        return jax.value_and_grad(f)(logits)

    with config_override(guard=False):
        l_off, g_off = jax.block_until_ready(val_grad(*args))
    with config_override():
        l_on, g_on = jax.block_until_ready(val_grad(*args))
    dl = abs(float(l_on) - float(l_off))
    dg = float(jnp.max(jnp.abs(g_on - g_off)))
    gmax = float(jnp.max(jnp.abs(g_off)))
    print(f"V={vocab:<4d} parity guard on/off: |dloss|={dl:.3e} "
          f"max|dgrad|={dg:.3e} (max|g|={gmax:.3e})", flush=True)

    for rep in (1, 2):
        with config_override(guard=False):
            ms_off = timed(classic_ctc_loss, args)
        with config_override():
            ms_on = timed(classic_ctc_loss, args)
        print(f"V={vocab:<4d} rep{rep}: guard off {ms_off:7.3f} ms   "
              f"rowmerge on {ms_on:7.3f} ms", flush=True)
