"""Dump compiled-HLO instruction statistics for the guarded vs unguarded
V=128 fwd+grad step — counts copies / conditionals / fusions and lists
every copy or bitcast-convert at [B, T, V] scale, to attribute the ~0.7 ms
cond tax mechanically instead of by conjecture."""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.quick_bench import make_inputs  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B = int(os.environ.get("QB_B", 256))
T = int(os.environ.get("QB_T", 500))
V = int(os.environ.get("QB_V", 128))
args = make_inputs(B, T, V)


def make_step():
    # fresh function object per config: the jit trace cache keys on the
    # function identity + avals, NOT on the library's config global — a
    # shared `step` across config_override blocks silently reuses the
    # first config's trace (the same pitfall _cfg_jit guards against)
    def step(labels, logits, ll, gl):
        def mean_finite(y):
            out = classic_ctc_loss(labels, y, ll, gl, 0)
            finite = jnp.isfinite(out)
            return jnp.sum(jnp.where(finite, out, 0.0)) / jnp.sum(finite)

        loss, grad = jax.value_and_grad(mean_finite)(logits)
        return loss + jnp.sum(grad) * 1e-9

    return step


def analyze(name, **kw):
    with config_override(**kw):
        txt = jax.jit(make_step()).lower(*args).compile().as_text()
    ops = Counter()
    big_copies = Counter()
    for line in txt.splitlines():
        m = re.search(r"=\s+(\w+\[[^\]]*\])\S*\s+([\w-]+)\(", line)
        if not m:
            continue
        shape, op = m.groups()
        ops[op] += 1
        if op in ("copy", "copy-start") and shape.count(",") >= 2:
            big_copies[shape] += 1
    interesting = {
        k: v
        for k, v in ops.items()
        if k in ("copy", "copy-start", "copy-done", "conditional", "fusion",
                 "custom-call", "while", "scatter", "gather", "dynamic-slice",
                 "dynamic-update-slice", "all-reduce", "sort")
    }
    print(f"--- {name} ---", flush=True)
    print("op counts:", dict(sorted(interesting.items())), flush=True)
    print("rank>=3 copies:", dict(big_copies.most_common(10)) or "none",
          flush=True)
    return txt


t_off = analyze("guard off", guard=False)
t_on = analyze("guard on (defaults)")
outdir = os.path.join(os.path.dirname(__file__), "results", "r5_session1")
os.makedirs(outdir, exist_ok=True)
with open(os.path.join(outdir, "hlo_guard_off.txt"), "w") as f:
    f.write(t_off)
with open(os.path.join(outdir, "hlo_guard_on.txt"), "w") as f:
    f.write(t_on)
print("HLO texts written", flush=True)
