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
    use_shard_map: bool | None = None,
):
    """Run a compiled attack over a mesh-sharded batch.

    attack_fn: (data, target, key) -> pytree of per-example results
      (built by any build_*_attack; already jitted; every output leaf
      is batch-leading).
    data/target: host arrays [B, N, 3] / [B]; B is padded to a multiple
      of the mesh size with edge replication and results are sliced back.

    Partitioning strategy (``use_shard_map=None`` auto-selects):
      * single device or CPU mesh: GSPMD — in/out shardings on the
        arguments, XLA partitions the jitted attack; per-example results
        are BIT-IDENTICAL to an unsharded run (test_parallel.py).
      * multi-device TPU: shard_map — Mosaic (Pallas) kernels cannot be
        auto-partitioned by GSPMD (jax raises; jax/_src/
        tpu_custom_call.py), so each chip traces the attack on its own
        shard under ops.backend.manual_sharding_scope, which keeps the
        fused kernels enabled.  The PRNG key is fold_in'd with the
        shard index, so stochastic init noise differs from the
        single-device stream (statistical, not bitwise, parity — the
        reference's own seeding guarantees no more, SURVEY §7).
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    (data_p, target_p), true_n = pad_to_multiple([data, target], n_dev)
    d, t = shard_batch(mesh, jnp.asarray(data_p), jnp.asarray(target_p))

    if use_shard_map is None:
        from pointcloudattack_tpu.ops.backend import is_tpu_backend

        use_shard_map = n_dev > 1 and is_tpu_backend()

    if use_shard_map:
        from jax.sharding import PartitionSpec as P

        from pointcloudattack_tpu.ops.backend import manual_sharding_scope

        def per_shard(ds, ts, k):
            k = jax.random.fold_in(k, jax.lax.axis_index("data"))
            return attack_fn(ds, ts, k)

        # check_vma off: attack scan carries start from unvarying
        # constants (best trackers) and become shard-varying
        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P()),
            out_specs=P("data"),
            check_vma=False,
        )
        with mesh, manual_sharding_scope():
            out = fn(d, t, key)
    else:
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
    """Mesh-sharded accuracy evaluation (reference test.py:180-195).

    Multi-device TPU meshes evaluate per shard via shard_map (same
    Mosaic-partitioning constraint as :func:`run_sharded_attack`).
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    @jax.jit
    def correct_fn(x, y):
        return (jnp.argmax(model_fn(x), axis=-1) == y).astype(jnp.int32)

    from pointcloudattack_tpu.ops.backend import (
        is_tpu_backend,
        manual_sharding_scope,
    )

    if n_dev > 1 and is_tpu_backend():
        from jax.sharding import PartitionSpec as P

        run = jax.shard_map(
            correct_fn, mesh=mesh,
            in_specs=(P("data"), P("data")), out_specs=P("data"),
            check_vma=False,
        )
        scope = manual_sharding_scope
    else:
        run = correct_fn
        scope = None

    total, count = 0, 0
    for i in range(0, len(labels), batch_size):
        chunk = data[i : i + batch_size]
        lab = labels[i : i + batch_size]
        (cp, lp), true_n = pad_to_multiple([chunk, lab], n_dev)
        x, y = shard_batch(mesh, jnp.asarray(cp), jnp.asarray(lp))
        if scope is not None:
            with mesh, scope():
                c = run(x, y)
        else:
            with mesh:
                c = run(x, y)
        total += int(np.asarray(c)[:true_n].sum())
        count += true_n
    return total / max(count, 1)
