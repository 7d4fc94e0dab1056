"""Re-sweep block geometry + window at the r5 shipped config (fold_pt=1,
winning guard struct): the (64, 16) blocks and window=8 were tuned in r2,
before fold_pt, the streamed-sa residual merge, and the guard restructure
changed the kernels' per-step op mix and HBM stream set.  Cheap check that
the old optimum still holds.

Rows: (block_batch, block_time) x window at V=32; the winner re-timed at
V=128.  Guard stays at the shipped default so the numbers are the
shipped-path numbers.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

args32 = make_inputs(256, 500, 32)
GEOMS = [
    (64, 16, 8),    # shipped
    (64, 16, 16),
    (128, 16, 8),
    (64, 32, 8),
    (32, 16, 8),
    (64, 8, 8),
    (128, 32, 8),
    (64, 32, 16),
]
best = None
for bb, bt, w in GEOMS:
    with config_override(block_batch=bb, block_time=bt, window=w):
        ms = timed(classic_ctc_loss, args32)
    print(f"V=32  bb={bb:<4d} bt={bt:<3d} w={w:<3d}: {ms:7.3f} ms", flush=True)
    if best is None or ms < best[0]:
        best = (ms, bb, bt, w)

print(f"winner: bb={best[1]} bt={best[2]} w={best[3]} ({best[0]:.3f} ms)",
      flush=True)
args128 = make_inputs(256, 500, 128)
for bb, bt, w in {(64, 16, 8), (best[1], best[2], best[3])}:
    with config_override(block_batch=bb, block_time=bt, window=w):
        ms = timed(classic_ctc_loss, args128)
    print(f"V=128 bb={bb:<4d} bt={bt:<3d} w={w:<3d}: {ms:7.3f} ms", flush=True)
