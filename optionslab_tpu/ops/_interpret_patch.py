"""Workaround for Pallas TPU-interpreter deadlocks under multi-device
``shard_map`` on small hosts (jax 0.9.0).

jax delivers ``jax.Array`` arguments to host callbacks (``io_callback`` /
``pure_callback``).  Several of the TPU interpreter's host callbacks do
Python-level work on those arguments that silently DISPATCHES new jax
programs from inside the callback thread:

- ``interpret_pallas_call.get:519`` iterates ``block_indices``
  (``tuple(int(x) for x in block_indices)``) — ``jax.Array.__iter__``
  dispatches chunked ``lax.slice`` programs (``array.py:375``);
- ``shared_memory.SharedMemory.update_clocks_for_device_barrier:589``
  does arithmetic on ``device_id`` — a jax scalar multiply.

When every XLA CPU compute thread is already occupied by the simulated
devices' outer programs (guaranteed on a 1-core box running a 4/8-device
virtual mesh, where all devices sit inside ordered callbacks at the same
time), the nested dispatch can never be scheduled and every simulated
device parks forever — observed as all threads in ``futex_do_wait`` with
zero CPU after a sharded interpret-mode kernel launch, flaky by
thread-scheduling.  (Confirmed by a ``faulthandler`` dump: four device
threads in ``get``'s genexpr via ``Array.__iter__``, the main thread
blocked on a host reduction of the kernel outputs.)

The complete fix is at the callback boundary: convert every ``jax.Array``
argument to a host ``numpy.ndarray`` (a device-to-host copy of an
already-computed buffer — no new dispatch) BEFORE the user/interpreter
callback runs, so no host callback can ever trip a nested dispatch.
``_FlatCallback.__call__`` is the single runtime choke point for all
callback flavors; patching the CLASS takes effect even for programs
traced before the patch ran.  The ``device_id`` barrier coercion is kept
as belt-and-braces.  No-op on jax versions without these modules
(guarded imports); idempotent.
"""

from __future__ import annotations

import numpy as np


def _patch_flat_callback() -> None:
    try:
        import jax
        from jax._src import callback as _cb
    except Exception:  # pragma: no cover - future jax refactors
        return
    orig = _cb._FlatCallback.__call__
    if getattr(orig, "_olab_patched", False):
        return

    def __call__(self, *flat_args):
        flat_args = tuple(
            np.asarray(a) if isinstance(a, jax.Array) else a
            for a in flat_args)
        return orig(self, *flat_args)

    __call__._olab_patched = True
    _cb._FlatCallback.__call__ = __call__


def _patch_device_barrier() -> None:
    try:
        from jax._src.pallas.mosaic.interpret import shared_memory as _sm
    except Exception:  # pragma: no cover - future jax refactors
        return
    orig = _sm.SharedMemory.update_clocks_for_device_barrier
    if getattr(orig, "_olab_patched", False):
        return

    def update_clocks_for_device_barrier(self, device_id):
        return orig(self, int(np.asarray(device_id)))

    update_clocks_for_device_barrier._olab_patched = True
    _sm.SharedMemory.update_clocks_for_device_barrier = (
        update_clocks_for_device_barrier)


def ensure_interpret_patch() -> None:
    _patch_flat_callback()
    _patch_device_barrier()


ensure_interpret_patch()
