"""Worker for the 4-process DP x TP test (see test_multiprocess.py).

Four OS processes (one CPU device each) form a 2x2 ``('data', 'model')``
mesh and run the full sharded train step (parallel/train.py): encoder
params tensor-sharded over ``'model'`` (up/down/head rules), utterance
batch sharded over ``'data'`` via the multi-host input pipeline
(``host_local_batch_to_global`` — processes in the same data group pass
identical rows, exercising the replicated-over-model assembly the
pairwise test never hits).  Run with ``nproc=1`` the same program builds
a degenerate 1x1 mesh single-process: the test compares the two runs'
step losses to 1e-5.

Params are materialised *globally* (``jax.jit`` with TP
``out_shardings``) rather than ``device_put`` from host copies — the
multi-host-safe construction (every process runs the same program; XLA
owns placement).
"""

import sys
from functools import partial

sys.path.insert(0, sys.argv[4])

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_platforms", "cpu")

from tf_seq2seq_losses_tpu.parallel import init_distributed  # noqa: E402

if nproc > 1:
    assert init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid,
    ) is True

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from tf_seq2seq_losses_tpu.models.encoder import init_encoder  # noqa: E402
from tf_seq2seq_losses_tpu.parallel import (  # noqa: E402
    global_mesh,
    host_local_batch_to_global,
    is_primary,
)
from tf_seq2seq_losses_tpu.parallel.train import (  # noqa: E402
    TrainState,
    make_train_step,
    param_shardings,
)

assert jax.process_count() == nproc
DATA, MODEL = (2, 2) if nproc == 4 else (1, 1)
mesh = global_mesh(("data", "model"), axis_shapes=(DATA, MODEL))

# global batch: B=8 utterances, T=16 frames, F=8 features; every process
# derives the full batch from the same seed and contributes its data
# group's rows (group = devices sharing a 'data' coordinate)
rng = np.random.RandomState(0)
B, T, F = 8, 16, 8
features = rng.randn(B, T, F).astype(np.float32)
labels = rng.randint(1, 8, (B, 3)).astype(np.int32)
batch = {
    "features": features,
    "feature_length": np.full((B,), T, np.int32),
    "labels": labels,
    "label_length": np.full((B,), 3, np.int32),
}
rows = B // DATA
group = pid // MODEL if nproc == 4 else 0
local = {k: v[group * rows:(group + 1) * rows] for k, v in batch.items()}
g = host_local_batch_to_global(mesh, local)

init_fn = partial(
    init_encoder, num_features=F, hidden=16, vocab=8, num_layers=1
)
key = jax.random.PRNGKey(7)
p_shard = param_shardings(jax.eval_shape(init_fn, key), mesh, "model")
params = jax.jit(init_fn, out_shardings=p_shard)(key)

opt = optax.sgd(0.1)
opt_state = jax.jit(opt.init)(params)

_, _, train_step = make_train_step(mesh, optimizer=opt)
state = TrainState(params, opt_state)
state, loss0 = train_step(state, g)
state, loss1 = train_step(state, g)

if is_primary():
    print(f"MP4_LOSS0={float(loss0):.8f}")
    print(f"MP4_LOSS1={float(loss1):.8f}")
    print("MULTIPROCESS_DP_TP_OK")

if nproc > 1:
    jax.distributed.shutdown()
