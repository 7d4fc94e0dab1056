"""Test configuration: force CPU with 8 virtual devices.

The CI/test environment may register an experimental TPU plugin (with remote
compilation) as the default JAX platform; tests must run locally and
deterministically, so we pin the platform to CPU and expose 8 virtual devices
for the sharding tests (SURVEY §4: the fake-backend trick).
"""

import os
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache.  Must be configured via config.update,
# not env vars: this container's sitecustomize imports jax at interpreter
# startup (before conftest runs), so JAX_COMPILATION_CACHE_DIR etc. set here
# would be latched too late and the cache silently stays uninitialized
# (measured: zero cache writes with the env-var route; warm suite compiles
# hit with this one).  CI caches the directory.


def _cpu_tag():
    """Microarchitecture fingerprint for the cache directory name.

    The container can land on different host CPUs between sessions;
    XLA:CPU AOT results compiled for one feature set loaded on another
    host trigger cpu_aot_loader machine-feature-mismatch warnings and can
    SIGILL/segfault (observed once mid-suite).  Keying the directory on
    the CPU flags makes stale cross-host entries unreachable instead of
    load-and-hope."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        tempfile.gettempdir(), f"tf_seq2seq_losses_tpu_jax_cache_{_cpu_tag()}"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def bound_compiled_state_fixture():
    """Module-teardown fixture releasing jit caches — used (as an autouse
    module-scope fixture) by the test modules that compile the suite's
    LARGEST executables: the saturation guard's whole-batch escalation
    modules (both lax.cond branches: fast kernels + log kernels + gather
    repair).

    jaxlib 0.9.0's XLA:CPU backend segfaults on those modules (in
    compile, serialize or deserialize — varies run to run) once the
    process has accumulated enough compiled state (4/4 full slow-suite
    runs crashed at the same tests; every shorter window passes, and a
    global every-module clear also fixes it at ~75 s of re-tracing the
    fast suite doesn't need — the heavy modules are all slow-marked).
    Dropping executable references after each heavy module bounds the
    state those compiles see."""
    import pytest as _pytest

    @_pytest.fixture(autouse=True, scope="module")
    def _bound_compiled_state():
        yield
        jax.clear_caches()

    return _bound_compiled_state


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def generate_ctc_loss_inputs(
    batch_size: int,
    max_logit_length: int,
    random_seed,
    num_tokens: int,
    blank_index: int,
):
    """Random CTC inputs mirroring the reference generator
    (/root/reference/tests/common.py:53-104): N(0,1) logits,
    ``logit_length in [T/2, T)``, ``label_length in [T/4, T/2)``,
    labels in ``[1, V)`` (blank = 0 assumed)."""
    assert blank_index == 0
    rand = np.random.RandomState(random_seed)
    import jax.numpy as jnp

    from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

    logits = jnp.asarray(
        rand.normal(size=(batch_size, max_logit_length, num_tokens)).astype(
            np.float32
        )
    )
    logit_length = jnp.asarray(
        rand.randint(
            max_logit_length // 2, max(max_logit_length, 1), size=batch_size
        ).astype(np.int32)
    )
    label_length = jnp.asarray(
        rand.randint(
            max(max_logit_length // 4, 1),
            max(max_logit_length // 2, 2),
            size=batch_size,
        ).astype(np.int32)
    )
    labels = jnp.asarray(
        rand.randint(1, num_tokens, size=(batch_size, max_logit_length)).astype(
            np.int32
        )
    )
    return {
        "labels": labels,
        "logits": logits,
        "logprobas": logit_to_logproba(logits, axis=2),
        "label_length": label_length,
        "logit_length": logit_length,
        "blank_index": blank_index,
    }
