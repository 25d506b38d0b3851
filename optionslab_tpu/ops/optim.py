"""On-device optimization loops.

The reference calibrates with host-side SciPy L-BFGS (one Python step per
iteration). The TPU-native form runs the ENTIRE Adam loop inside one
``lax.scan`` under jit — a calibration is a single device program (one
dispatch), with best-iterate tracking in the scan carry instead of host
polling. All model calibrations (SVI, SSVI, SABR, Heston) use this.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax


def scan_adam(loss_fn, x0, n_steps: int = 400, learning_rate: float = 0.02,
              clip: float | None = 1.0):
    """Minimize ``loss_fn(x)`` with Adam, fully on-device.

    Returns (best_x, best_loss, final_loss). NaN/inf losses never replace
    the best iterate, so a diverged tail can't destroy the result (the
    host-side analog raised mid-loop; here divergence is visible in
    ``final_loss``).
    """
    tx = optax.chain(optax.clip_by_global_norm(clip), optax.adam(learning_rate)) \
        if clip else optax.adam(learning_rate)

    def run(x0):
        state0 = tx.init(x0)
        loss0 = loss_fn(x0)

        def body(carry, _):
            x, state, best_x, best_loss = carry
            loss, grad = jax.value_and_grad(loss_fn)(x)
            updates, state = tx.update(grad, state, x)
            x_new = optax.apply_updates(x, updates)
            better = jnp.isfinite(loss) & (loss < best_loss)
            best_x = jax.tree.map(lambda b, c: jnp.where(better, c, b), best_x, x)
            best_loss = jnp.where(better, loss, best_loss)
            return (x_new, state, best_x, best_loss), loss

        (x, _, best_x, best_loss), losses = lax.scan(
            body, (x0, state0, x0, loss0), None, length=n_steps)
        final_loss = loss_fn(best_x)
        return best_x, jnp.minimum(best_loss, final_loss), losses[-1]

    return jax.jit(run)(x0)
