"""3-NN inverse-distance feature interpolation (PointNet++ FP layer).

Behavioral twin of reference model/pointnet2_utils.py:273-312 (also used
by the DUP-Net PU-Net upsampler, reference
attack/SIadv/baselines/defense/DUP_Net/pu_modules.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.gather import index_points
from pointcloudattack_tpu.ops.knn import knn_points


def three_nn_interpolate(
    xyz_dst: jax.Array,
    xyz_src: jax.Array,
    feat_src: jax.Array,
) -> jax.Array:
    """Interpolate features from a sparse set onto a dense set.

    Args:
      xyz_dst: [B, N, 3] positions to interpolate onto.
      xyz_src: [B, S, 3] positions carrying features.
      feat_src: [B, S, D] features.

    Returns:
      [B, N, D] interpolated features (inverse-distance weighted 3-NN).
    """
    dists, idx = knn_points(xyz_dst, xyz_src, k=3)  # sq dists, ascending
    recip = 1.0 / (dists + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)  # [B, N, 3]
    gathered = index_points(feat_src, idx)  # [B, N, 3, D]
    return jnp.sum(gathered * weight[..., None], axis=2)
