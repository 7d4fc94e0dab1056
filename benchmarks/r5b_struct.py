"""Guard-struct A/B on the chip (r5b): "cond" (tiered lax.cond lattice)
vs "while" (zero-trip lax.while_loop of gathered repair rounds).

The r5 decomposition attributed the guard's clean-path tax to whole-tensor
conditionals (even a single bare cond: +0.14 ms V=32 / +0.82 ms V=128,
benchmarks/r5_guard.py).  The while struct removes every whole-tensor
conditional: XLA aliases the loop carry in place and a 0-trip loop costs
its predicate only.  This script measures:

1. parity + Mosaic-lowering smoke at the benchmark shape (the kernels run
   INSIDE the while body on hardware for the first time here — interpret
   mode pins semantics, not lowering);
2. clean-path ms at V=32/128 for off / cond / while(tier1) / while(no-t1);
3. the escalation ladder (n = 1, 20, 40, 80 of 256 saturated) under the
   while struct, vs the same ladder's r5 cond numbers
   (benchmarks/results/r5_session1/diag_ladder.log).

Run under ``timeout 2400`` on the tunneled chip, host otherwise idle.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from benchmarks.diag_ladder import make_args, timed as timed_sat  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

# ---- 1. parity + lowering smoke (saturated batch through the while body
# on real Mosaic)
args_sat = make_args(20)


def grad_of(args):
    def f(y):
        out = classic_ctc_loss(args[0], y, args[2], args[3], 0)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    return jax.value_and_grad(f)(args[1])


with config_override(guard_struct="cond"):
    l_c, g_c = jax.jit(lambda: grad_of(args_sat))()
for tier1 in (True, False):
    with config_override(guard_struct="while", guard_tier1=tier1):
        l_w, g_w = jax.jit(lambda: grad_of(args_sat))()
    dl = float(jnp.abs(l_w - l_c))
    dg = float(jnp.max(jnp.abs(g_w - g_c)))
    print(
        f"parity n=20 while(tier1={int(tier1)}) vs cond: "
        f"|dloss|={dl:.3e} max|dgrad|={dg:.3e}",
        flush=True,
    )

# ---- 2. clean-path A/B
VARIANTS = [
    ("off        ", dict(guard=False)),
    ("cond       ", dict(guard_struct="cond")),
    ("while t1=1 ", dict(guard_struct="while", guard_tier1=True)),
    ("while t1=0 ", dict(guard_struct="while", guard_tier1=False)),
]
for vocab in (32, 128):
    args = make_inputs(256, 500, vocab)
    for name, kw in VARIANTS:
        for rep in (1, 2):
            with config_override(**kw):
                ms = timed(classic_ctc_loss, args)
            print(f"V={vocab:<4d} guard[{name}] rep{rep}: {ms:7.3f} ms",
                  flush=True)

# ---- 3. escalation ladder under the while struct
for tier1 in (True, False):
    with config_override(guard_struct="while", guard_tier1=tier1):
        clean = timed_sat(make_args(0))
        print(f"while(t1={int(tier1)}) clean: {clean:7.3f} ms", flush=True)
        for n in (1, 20, 40, 80):
            ms = timed_sat(make_args(n))
            print(
                f"while(t1={int(tier1)}) n={n:<3d}: {ms:7.3f} ms "
                f"({ms / clean:.2f}x)",
                flush=True,
            )
