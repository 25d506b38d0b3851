"""Wall-clock timing utilities, TPU-aware.

Reference capability: the decorator timers scattered through OptionsLab
(``src/utils/decorators/timing.py:6``, ``volatility_surface/base.py:19-46``,
``risk_analysis/var.py:52-62``). Here there is ONE registry-backed timer that
understands JAX async dispatch: results are blocked on (``block_until_ready``)
before the clock stops, so timings measure device work, not dispatch.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict
from typing import Any, Callable

import jax

_TIMINGS: dict[str, list[float]] = defaultdict(list)


def _block(x: Any) -> Any:
    try:
        return jax.block_until_ready(x)
    except Exception:
        return x


def timed(label: str | None = None) -> Callable:
    """Decorator: record blocked wall-clock ms per call under ``label``."""

    def deco(fn: Callable) -> Callable:
        key = label or f"{fn.__module__}.{fn.__qualname__}"

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = _block(fn(*args, **kwargs))
            _TIMINGS[key].append((time.perf_counter() - t0) * 1e3)
            return out

        return wrapper

    return deco


class Timer:
    """Context manager: ``with Timer("solve") as t: ...; t.ms``."""

    def __init__(self, label: str = ""):
        self.label = label
        self.ms = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1e3
        if self.label:
            _TIMINGS[self.label].append(self.ms)
        return False


def get_timings() -> dict[str, list[float]]:
    """All recorded timings (ms) keyed by label."""
    return {k: list(v) for k, v in _TIMINGS.items()}


def reset_timings() -> None:
    _TIMINGS.clear()


def benchmark_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kwargs) -> dict:
    """Latency harness: compile/warmup then time ``iters`` blocked calls.

    Returns mean/p50/p95/min in ms (reference capability:
    ``onnx_runtime.py:272`` benchmark and the Streamlit latency race).
    """
    for _ in range(max(warmup, 1)):
        _block(fn(*args, **kwargs))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    n = len(samples)
    return {
        "mean_ms": sum(samples) / n,
        "p50_ms": samples[n // 2],
        "p95_ms": samples[min(n - 1, int(0.95 * n))],
        "min_ms": samples[0],
        "iters": n,
    }
