"""Validate the VMEM-fit geometry model across T (VERDICT r2 #7).

For each T in {255, 500, 1000}, times the model-chosen default geometry
against neighbouring (block_batch, block_time) candidates in one run; the
default should sit within chip noise (~±0.3 ms) of the sweep optimum.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.ops import pallas_lattice as pk  # noqa: E402
from tf_seq2seq_losses_tpu.ops import core as core_mod  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

CANDS = [
    dict(),  # model default
    dict(block_batch=32, block_time=16),
    dict(block_batch=64, block_time=8),
]

for T in (255, 500, 1000):
    args = make_inputs(256, T, 32)
    ctx = core_mod.make_context(
        args[0],
        jax.numpy.zeros_like(args[1]),
        args[2],
        args[3],
        0,
    )
    geom = pk._grad_geometry(256, T, ctx.label.shape[1])
    print(f"T={T}: model geometry bpad={geom[0]} tpad={geom[1]} "
          f"lpad={geom[2]} bb={geom[3]} bt={geom[4]}", flush=True)
    for kw in CANDS:
        try:
            with config_override(**kw):
                ms = timed(classic_ctc_loss, args)
            tag = kw if kw else "default"
            print(f"  T={T} {tag} -> {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  T={T} {kw} -> FAILED {type(e).__name__}", flush=True)
