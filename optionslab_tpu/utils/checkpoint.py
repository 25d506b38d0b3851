"""Pytree checkpointing via orbax (SURVEY.md §5 checkpoint/resume: "orbax
checkpoints for fitted params").

Generic save/restore for any JAX pytree — model params, calibrated
``HestonParams``/``SVIParams``, optimizer states — with a plain-npz
fallback when orbax is unavailable.
"""

from __future__ import annotations

import json
import pathlib

import jax
import numpy as np

from .exceptions import ModelError


def save_pytree(tree, path) -> str:
    """Persist a pytree; returns the backend used ("orbax" | "npz")."""
    path = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), tree, force=True)
        ckptr.wait_until_finished()
        return "orbax"
    except Exception:
        leaves, treedef = jax.tree.flatten(tree)
        path.mkdir(parents=True, exist_ok=True)
        np.savez(path / "leaves.npz", **{str(i): np.asarray(x) for i, x in enumerate(leaves)})
        (path / "treedef.json").write_text(json.dumps(str(treedef)))
        return "npz"


def restore_pytree(path, like=None):
    """Restore a pytree saved by :func:`save_pytree`.

    ``like``: an example pytree with the target structure/dtypes (required
    for orbax restoration and for rebuilding structure from npz).
    """
    path = pathlib.Path(path)
    if (path / "leaves.npz").exists():
        if like is None:
            raise ModelError("npz restore requires a `like` pytree for the structure")
        leaves = dict(np.load(path / "leaves.npz"))
        _, treedef = jax.tree.flatten(like)
        return jax.tree.unflatten(treedef, [leaves[str(i)] for i in range(len(leaves))])
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), like)
        return ckptr.restore(path.absolute(), target)
    return ckptr.restore(path.absolute())
