"""FPS + ball-query grouping for PointNet++-style set abstraction.

Behavioral twin of reference model/pointnet2_utils.py:107-155, channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.ball_query import query_ball_point
from pointcloudattack_tpu.ops.fps import farthest_point_sample
from pointcloudattack_tpu.ops.gather import index_points


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    points: jax.Array | None,
    *,
    key: jax.Array | None = None,
    return_fps: bool = False,
):
    """FPS-select npoint centroids and group their radius neighbourhoods.

    Args:
      npoint, radius, nsample: grouping hyperparameters.
      xyz: [B, N, 3] positions.
      points: [B, N, D] features or None.
      key: PRNG key for the FPS start point.
      return_fps: also return (grouped_xyz, fps_idx).

    Returns:
      new_xyz [B, npoint, 3], new_points [B, npoint, nsample, 3(+D)]
      (+ grouped_xyz, fps_idx when return_fps).
    """
    fps_idx = farthest_point_sample(xyz, npoint, key=key)
    new_xyz = index_points(xyz, fps_idx)  # [B, S, 3]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)  # [B, S, nsample, 3]
    grouped_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_norm
    if return_fps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(xyz: jax.Array, points: jax.Array | None):
    """Single group containing the whole cloud (final SA layer).

    Returns new_xyz [B, 1, 3] of zeros and new_points [B, 1, N, 3(+D)].
    """
    b, n, c = xyz.shape
    new_xyz = jnp.zeros((b, 1, c), dtype=xyz.dtype)
    grouped = xyz[:, None, :, :]
    if points is not None:
        new_points = jnp.concatenate(
            [grouped, points[:, None, :, :]], axis=-1
        )
    else:
        new_points = grouped
    return new_xyz, new_points
