"""Data-parallel scaling harness: weak-scaling efficiency of the DP loss.

Measures the sharded mean-CTC-loss + gradient step at a fixed per-device
batch while growing the mesh 1 -> N devices; linear scaling keeps ms/step
constant (efficiency = t1 / tN).

On a real TPU pod, launch one process per host with ``--multihost``: it
calls :func:`tf_seq2seq_losses_tpu.parallel.init_distributed` (coordinator
auto-detected on cloud TPU, or via ``CTC_TPU_COORDINATOR`` /
``CTC_TPU_NUM_PROCESSES`` / ``CTC_TPU_PROCESS_ID``), builds one global mesh,
feeds per-host batch shards, and gates printing on process 0.  Without a
configured coordinator ``--multihost`` degrades to the single-process local
mode.  Locally it runs on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --cpu

Note: virtual CPU devices share host cores, so local numbers validate the
mechanics (shardings compile, one psum, no stray collectives), not the
ICI-scaling efficiency itself.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true", help="force CPU backend")
parser.add_argument(
    "--multihost",
    action="store_true",
    help="pod run: jax.distributed.initialize() (auto-detected coordinator "
    "or CTC_TPU_COORDINATOR/NUM_PROCESSES/PROCESS_ID env), global mesh over "
    "all hosts, per-host batch shards, process-0-gated printing",
)
parser.add_argument("--per-device-batch", type=int, default=16)
parser.add_argument("--time", type=int, default=100)
parser.add_argument("--vocab", type=int, default=32)
args = parser.parse_args()

if args.cpu:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tf_seq2seq_losses_tpu.parallel.distributed import (  # noqa: E402
    host_local_batch_to_global,
    init_distributed,
    is_primary,
)
from tf_seq2seq_losses_tpu.parallel.sharding import (  # noqa: E402
    make_mesh,
    shard_batch,
    sharded_mean_ctc_loss,
)

MULTIHOST = init_distributed() if args.multihost else False


def make_inputs(batch, max_t, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        labels=jnp.asarray(rng.randint(1, vocab, (batch, max_t // 2)).astype(np.int32)),
        logits=jnp.asarray(rng.randn(batch, max_t, vocab).astype(np.float32)),
        label_length=jnp.asarray(
            rng.randint(max_t // 4, max_t // 2, (batch,)).astype(np.int32)
        ),
        logit_length=jnp.asarray(
            rng.randint(max_t // 2, max_t, (batch,)).astype(np.int32)
        ),
    )


def step_ms(n_dev, reps=10):
    if MULTIHOST:
        # global mesh over every host's chips; each process contributes only
        # its local batch shard (the standard multi-host input pipeline)
        mesh = make_mesh((n_dev,), ("data",))
        local = make_inputs(
            args.per_device_batch * jax.local_device_count(),
            args.time,
            args.vocab,
            seed=jax.process_index(),
        )
        placed = host_local_batch_to_global(
            mesh, {k: np.asarray(v) for k, v in local.items()}
        )
    else:
        mesh = make_mesh((n_dev,), ("data",), devices=jax.devices()[:n_dev])
        batch = make_inputs(args.per_device_batch * n_dev, args.time, args.vocab)
        placed = shard_batch(mesh, batch)
    loss_fn = sharded_mean_ctc_loss(mesh, topology="classic")

    def fwd_grad():
        return jax.value_and_grad(
            lambda x: loss_fn(
                placed["labels"], x, placed["label_length"], placed["logit_length"]
            )
        )(placed["logits"])

    jitted = jax.jit(fwd_grad)
    jax.block_until_ready(jitted())  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jitted()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = len(jax.devices())
    if MULTIHOST:
        # one size: the whole pod (sub-pod meshes would need per-size
        # process subsets); baseline for efficiency is a 1-host rerun
        sizes = [n]
    else:
        sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    base = None
    if is_primary():
        print(
            f"devices: {n} x {jax.devices()[0].platform} over "
            f"{jax.process_count()} process(es); "
            f"per-device batch {args.per_device_batch}, T={args.time}"
        )
    for s in sizes:
        ms = step_ms(s)
        if base is None:
            base = ms
        eff = base / ms
        if is_primary():
            print(f"N={s:<3d} global_batch={args.per_device_batch * s:<5d} "
                  f"{ms:8.2f} ms/step  weak-scaling efficiency {eff:5.2f}")


if __name__ == "__main__":
    main()
