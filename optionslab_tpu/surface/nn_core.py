"""Shared pure-JAX MLP core for the surface models.

Replaces the reference's PyTorch plumbing (``mlp_model.py``, ``tensor_utils.py``)
with an explicit-pytree MLP: init/apply functions, LayerNorm (TPU-friendly,
no running batch statistics to desynchronize under sharding — the reference
fights batchnorm/MC-dropout interactions at ``mlp_model.py:259-274``),
dropout with explicit keys, and a jitted Adam early-stopping train loop.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32):
    """He-initialized params: list of {'w','b'} plus layernorm scales."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, (fan_in, fan_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        w = jax.random.normal(k, (fan_in, fan_out), dtype) * jnp.sqrt(2.0 / fan_in)
        params.append({
            "w": w,
            "b": jnp.zeros((fan_out,), dtype),
            "ln_scale": jnp.ones((fan_out,), dtype),
            "ln_bias": jnp.zeros((fan_out,), dtype),
        })
    return params


def apply_mlp(params, x, *, dropout_rate: float = 0.0, dropout_key=None,
              layernorm: bool = True, activation=jax.nn.gelu):
    """Forward pass; hidden layers get activation (+LayerNorm, +dropout),
    final layer is linear."""
    h = x
    n = len(params)
    for i, layer in enumerate(params):
        # HIGHEST: TPU default matmul is bf16; surface-accuracy claims are
        # at the 1e-3 level, which bf16 forward passes would erode
        h = jnp.matmul(h, layer["w"],
                       precision=jax.lax.Precision.HIGHEST) + layer["b"]
        if i < n - 1:
            if layernorm:
                mu = h.mean(axis=-1, keepdims=True)
                var = h.var(axis=-1, keepdims=True)
                h = (h - mu) * jax.lax.rsqrt(var + 1e-6)
                h = h * layer["ln_scale"] + layer["ln_bias"]
            h = activation(h)
            if dropout_rate > 0.0 and dropout_key is not None:
                dropout_key = jax.random.fold_in(dropout_key, i)
                keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    return h


def _make_opt(learning_rate, weight_decay, grad_clip):
    import optax

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )


@functools.partial(jax.jit, static_argnames=(
    "epochs", "batch_size", "n_batches", "learning_rate", "weight_decay",
    "dropout_rate", "grad_clip", "layernorm"))
def _train_mlp_scanned(params, x_tr, y_tr, x_va, y_va, key, *, epochs,
                       batch_size, n_batches, learning_rate, weight_decay,
                       dropout_rate, grad_clip, layernorm=True):
    """The WHOLE training run as one device program: epochs × minibatch
    scan with best-validation-iterate tracking in the carry (the scanned
    analog of early stopping — running the remaining epochs is cheaper
    than a host round-trip per epoch). Module-level jit with static
    hyperparameters: repeat trainings at the same shapes skip
    compilation, the same cache discipline as ``ops/optim.
    scan_adam_cached``."""
    import optax

    opt = _make_opt(learning_rate, weight_decay, grad_clip)
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb, dk):
        pred = apply_mlp(p, xb, dropout_rate=dropout_rate, dropout_key=dk,
                         layernorm=layernorm)
        return jnp.mean((pred - yb) ** 2)

    def val_of(p):
        return jnp.mean((apply_mlp(p, x_va, layernorm=layernorm)
                         - y_va) ** 2)

    def epoch_body(carry, e):
        p, st, best_p, best_v = carry
        ek = jax.random.fold_in(key, e + 1)

        def body(c2, i):
            p2, st2 = c2
            start = i * batch_size
            xb = jax.lax.dynamic_slice_in_dim(x_tr, start, batch_size)
            yb = jax.lax.dynamic_slice_in_dim(y_tr, start, batch_size)
            loss, g = jax.value_and_grad(loss_fn)(
                p2, xb, yb, jax.random.fold_in(ek, i))
            u, st2 = opt.update(g, st2, p2)
            return (optax.apply_updates(p2, u), st2), loss

        (p, st), losses = jax.lax.scan(body, (p, st),
                                       jnp.arange(n_batches))
        vl = val_of(p)
        better = vl < best_v
        best_p = jax.tree.map(lambda b, c: jnp.where(better, c, b),
                              best_p, p)
        best_v = jnp.where(better, vl, best_v)
        return (p, st, best_p, best_v), (losses.mean(), vl)

    (_, _, best_p, best_v), (tr_hist, va_hist) = jax.lax.scan(
        epoch_body, (params, opt_state, params, val_of(params)),
        jnp.arange(epochs))
    return best_p, best_v, tr_hist, va_hist


def train_mlp(params, x, y, loss_extra_fn=None, *, key,
              epochs: int = 200, batch_size: int = 256, learning_rate: float = 1e-3,
              weight_decay: float = 1e-5, dropout_rate: float = 0.1,
              patience: int = 15, grad_clip: float = 1.0,
              val_fraction: float = 0.15, verbose: bool = False,
              layernorm: bool = True):
    """AdamW + grad clip + early stopping (the reference's training recipe,
    ``mlp_model.py:161-236``, as one jitted step in an epoch loop).

    ``loss_extra_fn(params, xb) -> scalar`` adds physics/smoothness penalties
    (used by the PINN and the smoothness option).

    Returns (best_params, history dict).
    """
    import optax

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32).reshape(-1, 1)
    n = x.shape[0]
    n_val = max(1, int(n * val_fraction))
    perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
    x, y = x[perm], y[perm]
    x_tr, y_tr = x[n_val:], y[n_val:]
    x_va, y_va = x[:n_val], y[:n_val]
    n_tr = x_tr.shape[0]
    batch_size = min(batch_size, n_tr)
    n_batches = max(1, n_tr // batch_size)

    if loss_extra_fn is None and not verbose:
        # fast path: the whole run is ONE cached device program (best-val
        # tracking replaces host-loop early stopping — strictly at least
        # as good an iterate, and repeat fits skip compilation)
        best_p, best_v, tr_hist, va_hist = _train_mlp_scanned(
            params, x_tr, y_tr, x_va, y_va, key, epochs=int(epochs),
            batch_size=int(batch_size), n_batches=int(n_batches),
            learning_rate=float(learning_rate),
            weight_decay=float(weight_decay),
            dropout_rate=float(dropout_rate), grad_clip=float(grad_clip),
            layernorm=bool(layernorm))
        va = np.asarray(va_hist)
        history = {"train_loss": [float(v) for v in np.asarray(tr_hist)],
                   "val_loss": [float(v) for v in va],
                   "best_epoch": int(va.argmin()),
                   "best_val_loss": float(best_v)}
        return best_p, history

    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb, dk):
        pred = apply_mlp(p, xb, dropout_rate=dropout_rate, dropout_key=dk,
                         layernorm=layernorm)
        loss = jnp.mean((pred - yb) ** 2)
        if loss_extra_fn is not None:
            loss = loss + loss_extra_fn(p, xb)
        return loss

    @jax.jit
    def train_epoch(p, opt_state, ek):
        def body(carry, i):
            p, opt_state = carry
            start = i * batch_size
            xb = jax.lax.dynamic_slice_in_dim(x_tr, start, batch_size)
            yb = jax.lax.dynamic_slice_in_dim(y_tr, start, batch_size)
            loss, g = jax.value_and_grad(loss_fn)(p, xb, yb, jax.random.fold_in(ek, i))
            u, opt_state = opt.update(g, opt_state, p)
            p = optax.apply_updates(p, u)
            return (p, opt_state), loss

        (p, opt_state), losses = jax.lax.scan(body, (p, opt_state), jnp.arange(n_batches))
        return p, opt_state, losses.mean()

    @jax.jit
    def val_loss(p):
        pred = apply_mlp(p, x_va, layernorm=layernorm)
        return jnp.mean((pred - y_va) ** 2)

    best_params, best_val, best_epoch = params, float("inf"), 0
    history = {"train_loss": [], "val_loss": []}
    for epoch in range(epochs):
        params, opt_state, tr_loss = train_epoch(params, opt_state, jax.random.fold_in(key, epoch + 1))
        vl = float(val_loss(params))
        history["train_loss"].append(float(tr_loss))
        history["val_loss"].append(vl)
        if vl < best_val - 1e-7:
            best_val, best_params, best_epoch = vl, params, epoch
        elif epoch - best_epoch >= patience:
            break
    history["best_epoch"] = best_epoch
    history["best_val_loss"] = best_val
    return best_params, history


def mc_dropout_predict(params, x, key, n_samples: int = 32,
                       dropout_rate: float = 0.1, layernorm: bool = True):
    """MC-dropout mean/std (reference: ``mlp_model.py:259-274``) as one
    vmapped batch of stochastic forwards."""
    keys = jax.random.split(key, n_samples)
    preds = jax.vmap(
        lambda k: apply_mlp(params, x, dropout_rate=dropout_rate,
                            dropout_key=k, layernorm=layernorm)
    )(keys)
    return preds.mean(axis=0), preds.std(axis=0)


def flatten_params(params) -> dict:
    out = {}
    for i, layer in enumerate(params):
        for k, v in layer.items():
            out[f"layer{i}_{k}"] = np.asarray(v)
    return out


def unflatten_params(arrays: dict):
    layers = {}
    for name, v in arrays.items():
        if not name.startswith("layer"):
            continue
        idx, key = name[5:].split("_", 1)
        layers.setdefault(int(idx), {})[key] = jnp.asarray(v)
    return [layers[i] for i in sorted(layers)]
