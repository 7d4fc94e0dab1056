"""Tracing/profiling helpers.

The reference's only tracing hooks are ``tf.name_scope`` labels on its
``unfold`` loops (tools.py:245; SURVEY §5).  The TPU-native equivalents:

* :func:`annotate` — a context manager combining ``jax.named_scope`` (names
  the XLA HLO region) with ``jax.profiler.TraceAnnotation`` (names the host
  span in a profiler trace), so kernels show up legibly both in XProf device
  traces and in HLO dumps.  The pure lattice recursions already carry
  ``named_scope`` labels ("classic_alpha", "simplified_gamma", ...).
* :func:`trace_to` — wraps ``jax.profiler.trace`` for one-call capture of a
  TensorBoard-compatible trace directory.
* :func:`block_ms` — wall-clock of a thunk with ``block_until_ready``, the
  minimal honest device timing (benchmarks use the stronger serialized
  ``fori_loop`` differencing protocol; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def annotate(name: str):
    """Name the enclosed computation in both HLO and profiler traces."""
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a profiler trace of the enclosed block to ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_ms(fn: Callable[[], object], iters: int = 1) -> float:
    """Wall-clock milliseconds per call of ``fn`` with device sync."""
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3
