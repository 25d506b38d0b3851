"""Device profiling hooks (SURVEY.md §5 tracing: "jax.profiler traces +
block_until_ready timing harness").

``trace(dir)`` captures an XLA/TPU trace viewable in TensorBoard/XProf;
``annotate(name)`` marks a region so kernels group under it in the trace.
The wall-clock registry lives in ``utils.timing``.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/optionslab_trace"):
    """Profile everything in the block: `with trace("/tmp/t"): run()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (usable as ctx or decorator)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device live-memory statistics where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = None
    return out
