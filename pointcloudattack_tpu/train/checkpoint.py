"""Checkpoint save/restore via orbax.

TPU-native replacement for the reference's ``torch.save(state_dict)``
(reference train.py:187-194) and the richer-but-unused
``Training_aux.save_checkpoint`` (attack/GeoA3/utility.py:578-638):
variables (params + batch_stats), optimizer state and step counter are
stored together; ``best`` checkpoints mirror the reference's
best-accuracy file convention.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, tree: Any, *, overwrite: bool = True):
    """Save a pytree of arrays to ``path`` (a directory)."""
    path = os.path.abspath(os.path.expanduser(path))
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            path, jax.tree_util.tree_map(np.asarray, tree), force=overwrite
        )
    else:  # flat-npz fallback
        flat, treedef = jax.tree_util.tree_flatten(tree)
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "ckpt.npz"),
            **{str(i): np.asarray(a) for i, a in enumerate(flat)},
        )


def restore_checkpoint(path: str, like: Any | None = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``like`` (an example pytree) restores the exact structure/dtypes.
    """
    path = os.path.abspath(os.path.expanduser(path))
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if like is not None:
            return ckptr.restore(path, item=like)
        return ckptr.restore(path)
    data = np.load(os.path.join(path, "ckpt.npz"))
    flat = [data[str(i)] for i in range(len(data.files))]
    if like is None:
        raise ValueError("npz fallback requires `like` for the treedef")
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, flat)
