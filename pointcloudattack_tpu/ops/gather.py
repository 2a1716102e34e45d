"""Batched point gathering.

Replaces the reference's fancy-indexing helpers
(``index_points``, reference model/pointnet2_utils.py:41-57;
``knn_gather``, reference attack/GeoA3/knn_utils.py:58-86) with
``jnp.take_along_axis``, which XLA lowers to a single dynamic-gather —
no materialized batch-index tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points by index along the point axis.

    Args:
      points: [B, N, C].
      idx: [B, S] or [B, S, K] integer indices into N.

    Returns:
      [B, S, C] or [B, S, K, C] gathered points.
    """
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[..., None], axis=1)
    if idx.ndim == 3:
        b, s, k = idx.shape
        flat = jnp.take_along_axis(
            points, idx.reshape(b, s * k)[..., None], axis=1
        )
        return flat.reshape(b, s, k, points.shape[-1])
    raise ValueError(f"idx must be rank 2 or 3, got shape {idx.shape}")


def knn_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """pytorch3d-style gather: x [B, M, C], idx [B, N, K] -> [B, N, K, C]."""
    return index_points(x, idx)
