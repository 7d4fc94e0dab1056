"""Multi-host (pod-scale) initialisation and host-local batch plumbing.

SURVEY §2.3's DP row mandates multi-host data parallelism "via
``jax.distributed.initialize`` over DCN"; the reference itself is
single-device by design (no ``tf.distribute`` anywhere), so this layer is
TPU-native new capability, not a port.

The recipe (jax-ml.github.io/scaling-book): one Python process per host,
each seeing only its local chips; :func:`init_distributed` wires the
processes into one JAX runtime, after which ``jax.devices()`` is global and
a single :class:`~jax.sharding.Mesh` over it makes ``shard_map``/``pjit``
collectives ride ICI within a slice and DCN across hosts — no transport code
here, XLA owns the wire.

Single-process runs (tests, the tunneled single chip, CPU meshes) are the
degenerate case: :func:`init_distributed` is a no-op returning ``False``
and every helper below collapses to its local meaning.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise JAX's multi-process runtime when a pod run is configured.

    Returns ``True`` iff the run is multi-process (after initialisation).

    Configuration sources, in order:

    * explicit arguments;
    * the standard env vars JAX's cluster detection understands on cloud
      TPU pods (it auto-detects coordinator/process count — in that case
      ``jax.distributed.initialize()`` with no arguments is correct);
    * ``CTC_TPU_COORDINATOR`` / ``CTC_TPU_NUM_PROCESSES`` /
      ``CTC_TPU_PROCESS_ID`` for manual launches.

    With no configuration at all this is a **no-op** (single process), so
    harnesses can call it unconditionally.
    """
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get(
        "CTC_TPU_COORDINATOR"
    )
    if num_processes is None and os.environ.get("CTC_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["CTC_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CTC_TPU_PROCESS_ID"):
        process_id = int(os.environ["CTC_TPU_PROCESS_ID"])

    if _INITIALIZED:
        return jax.process_count() > 1

    # Pod auto-detection: a multi-worker TPU_WORKER_HOSTNAMES list (comma
    # separated) or a Megascale coordinator.  A single-entry hostname list
    # (one host, e.g. a tunneled single chip) is NOT a pod.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_detected = ("," in workers) or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and not auto_detected:
        return False  # single-process run: nothing to initialise

    # NOTE: must run before anything touches the XLA backend (jax.devices()
    # etc.); if the backend is already up we degrade loudly to single-process
    # rather than crash the harness.
    try:
        if coordinator_address is None:
            # cloud TPU pod: JAX's cluster auto-detection fills everything in
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except RuntimeError as e:
        # A RuntimeError here most commonly means the XLA backend is
        # already up (initialize() must run first).  When the caller did
        # not explicitly configure a pod, degrade loudly to single-process
        # rather than crash the harness — keyed on the *call's intent*, not
        # on JAX's exact message text (which has been reworded across
        # versions).  An explicitly configured pod run re-raises: silently
        # running single-process there would corrupt a real job.
        if coordinator_address is not None:
            raise
        import warnings

        warnings.warn(
            "init_distributed(): jax.distributed.initialize() failed "
            f"({e}); continuing single-process. Call init_distributed() "
            "before any other JAX use for a pod run.",
            stacklevel=2,
        )
        return False
    _INITIALIZED = True
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint IO."""
    return jax.process_index() == 0


def global_mesh(axis_names=("data",), axis_shapes=None) -> "jax.sharding.Mesh":
    """Mesh over every device of every process (call after
    :func:`init_distributed`)."""
    from tf_seq2seq_losses_tpu.parallel.sharding import make_mesh

    return make_mesh(axis_shapes, axis_names)


def host_local_batch_to_global(mesh, tree, data_axis: str = "data"):
    """Assemble per-host batch shards into batch-sharded global arrays.

    Each process passes only the samples it loaded (``global_batch /
    process_count`` of them, batch-major); the result is a pytree of global
    arrays sharded over ``data_axis`` whose global batch is the concatenation
    over processes — the standard multi-host input pipeline
    (``jax.make_array_from_process_local_data``).  Single-process this is
    just ``shard_batch``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x
        )

    return jax.tree_util.tree_map(place, tree)
