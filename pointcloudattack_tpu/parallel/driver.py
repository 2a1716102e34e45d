"""Batch-sharded attack driver.

Attack generation is embarrassingly parallel over clouds: shard the batch
across the mesh, run the jitted attack on every chip's shard, and reduce
success/transfer counters with a psum that rides ICI.  This replaces the
reference's batch-size-1 host loops (e.g. attack/CW/Eval_CW.py:21-52)
with whole-mesh batches.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudattack_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    shard_batch,
)


def run_sharded_attack(
    attack_fn: Callable,
    data: np.ndarray,
    target: np.ndarray,
    key: jax.Array,
    mesh=None,
):
    """Run a compiled attack over a mesh-sharded batch.

    attack_fn: (data, target, key) -> pytree of per-example results
      (built by any build_*_attack; already jitted).
    data/target: host arrays [B, N, 3] / [B]; B is padded to a multiple
      of the mesh size with edge replication and results are sliced back.

    With in/out shardings attached to the arguments, XLA partitions the
    jitted attack across the mesh automatically — each chip optimizes its
    shard of the batch, no code changes to the attack itself.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    (data_p, target_p), true_n = pad_to_multiple([data, target], n_dev)
    d, t = shard_batch(mesh, jnp.asarray(data_p), jnp.asarray(target_p))
    with mesh:
        out = attack_fn(d, t, key)
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a)[:true_n] if a.ndim >= 1 else np.asarray(a),
        out,
    )


def run_sharded_training(
    model,
    variables: dict,
    cfg,
    train_data: np.ndarray,
    train_labels: np.ndarray,
    mesh=None,
    **fit_kwargs,
) -> dict:
    """Data-parallel fit over the mesh (SURVEY §2.6 training-side DP).

    Replicated params, batch-sharded data — the dryrun_multichip
    pattern made reusable; delegates to ``train.trainer.fit`` with the
    mesh attached.  ``cfg.batch_size`` must divide by the mesh size
    (fit raises otherwise).
    """
    from pointcloudattack_tpu.train.trainer import fit

    mesh = mesh or make_mesh()
    return fit(
        model, variables, cfg, train_data, train_labels,
        mesh=mesh, **fit_kwargs,
    )


def sharded_accuracy(
    model_fn: Callable,
    data: np.ndarray,
    labels: np.ndarray,
    mesh=None,
    batch_size: int = 256,
):
    """Mesh-sharded accuracy evaluation (reference test.py:180-195)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    @jax.jit
    def correct_fn(x, y):
        return (jnp.argmax(model_fn(x), axis=-1) == y).astype(jnp.int32)

    total, count = 0, 0
    for i in range(0, len(labels), batch_size):
        chunk = data[i : i + batch_size]
        lab = labels[i : i + batch_size]
        (cp, lp), true_n = pad_to_multiple([chunk, lab], n_dev)
        x, y = shard_batch(mesh, jnp.asarray(cp), jnp.asarray(lp))
        with mesh:
            c = correct_fn(x, y)
        total += int(np.asarray(c)[:true_n].sum())
        count += true_n
    return total / max(count, 1)
