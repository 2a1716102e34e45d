"""SOR: statistical outlier removal defense (ICCV'19 DUP-Net).

Behavioral twin of reference
attack/SIadv/baselines/defense/drop_points/SOR.py:24-84: drop points whose
mean-kNN distance exceeds mean + alpha * std, then pad back to ``npoint``
by cyclically duplicating the survivors.

TPU re-design: the reference concatenates variable-length survivor lists
per cloud on the host.  Here survivors are compacted in-order with a
stable argsort on the drop mask and re-padded with a modular gather —
fixed shapes end to end, fully batched, jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.pairwise import self_sqdist


def sor_defense(
    pc: jax.Array, k: int = 2, alpha: float = 1.1, npoint: int = 1024
) -> jax.Array:
    """Remove statistical outliers and pad survivors to ``npoint``.

    Args:
      pc: [B, N, 3] input clouds.
      k: kNN size (reference default 2).
      alpha: threshold = mean + alpha * std (reference default 1.1).
      npoint: static output point count.

    Returns:
      [B, npoint, 3] clouds.
    """
    b, n, _ = pc.shape
    d = self_sqdist(pc)
    neg, _ = jax.lax.top_k(-d, k + 1)  # self included as nearest
    value = jnp.mean(-neg[..., 1:], axis=-1)  # [B, N] mean kNN dist
    mean = jnp.mean(value, axis=-1, keepdims=True)
    std = jnp.std(value, axis=-1, keepdims=True, ddof=1)
    keep = value <= mean + alpha * std  # [B, N]

    # stable compaction: kept points first, original order preserved
    order = jnp.argsort(~keep, axis=-1, stable=True)  # [B, N]
    compacted = jnp.take_along_axis(pc, order[..., None], axis=1)
    num_kept = jnp.sum(keep, axis=-1, keepdims=True)  # [B, 1]
    num_kept = jnp.maximum(num_kept, 1)

    # cyclic pad to npoint (reference process_data, SOR.py:56-76)
    idx = jnp.arange(npoint)[None, :] % num_kept  # [B, npoint]
    return jnp.take_along_axis(compacted, idx[..., None], axis=1)
