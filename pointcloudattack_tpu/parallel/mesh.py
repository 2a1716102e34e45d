"""Device mesh setup for data-parallel attack generation and training.

The reference has no distributed execution at all (SURVEY.md §2.6 — only
dead DDP imports).  This layer is the TPU-native equivalent: a 1-D
``data`` mesh over all chips, batch-sharded inputs, replicated params;
XLA inserts the psum/all-gather collectives over ICI from the sharding
annotations.  The models are tiny, so no tensor/pipeline parallelism is
needed — DP over clouds is the production parallelism for this workload.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, configs) onto every mesh device."""
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(arrays, multiple: int, axis: int = 0):
    """Pad the batch axis to a multiple of the mesh size.

    Returns (padded_arrays, true_size) — callers slice results back.
    """
    n = arrays[0].shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arrays, n
    out = []
    for a in arrays:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        out.append(np.pad(np.asarray(a), widths, mode="edge"))
    return out, n
