"""Multi-host (DCN) entry helpers.

The reference is single-GPU; SURVEY.md §5.8 calls for ICI collectives
in-mesh (parallel/mesh.py + driver.py) and DCN only for multi-host data
loading.  This module is the thin multi-host entry: initialize the
distributed runtime, build a global mesh, and feed each host its local
batch shard via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """jax.distributed.initialize with env-based autodetection.

    No-op on a single host (jax.process_count() == 1 afterwards either
    way); call before any other jax API on multi-host pods.
    """
    kwargs = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # benign double-init / single-process cases only; genuine
        # misconfiguration (bad coordinator, missing process counts)
        # must surface, not silently fall back to single-host
        msg = str(e).lower()
        if "already" not in msg and "single" not in msg:
            raise


def global_mesh() -> Mesh:
    """1-D data mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), axis_names=("data",))


def host_local_batch_to_global(
    mesh: Mesh, *host_arrays: np.ndarray
):
    """Assemble per-host local batches into batch-sharded global arrays.

    Each host passes its own shard (same shapes across hosts); the
    result is a global jax.Array sharded over the 'data' axis — the DCN
    multi-host loading pattern.
    """
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in host_arrays
    )
    return out if len(out) > 1 else out[0]
