"""All-pairs squared Euclidean distance.

This is THE hot op of the whole framework: it backs Chamfer/Hausdorff
distances, kNN graphs (DGCNN EdgeConv, KNNDist, SOR), ball query, the AOF
graph Laplacian, and GeoA3's kNN losses.  The reference computes it as
``|x|^2 + |y|^2 - 2 x.y^T`` with a dense [B, N, M] result
(reference attack/CW/CW_utils/distance.py:15-32 and
model/pointnet2_utils.py:19-38).

On TPU the ``-2 x.y^T`` term is an MXU matmul; XLA fuses the rank-1 norm
adds into the matmul epilogue.  A Pallas kernel is provided for the fused
"distance -> row-min/row-reduce" pattern used by Chamfer/Hausdorff so the
[N, M] matrix never round-trips through HBM (see
pointcloudattack_tpu/ops/pallas/chamfer_kernel.py); the plain dense matrix
below is already near-roofline for N <= 10k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared distance between every pair of points.

    Args:
      x: [..., N, C] points.
      y: [..., M, C] points.

    Returns:
      [..., N, M] squared Euclidean distances.
    """
    # -2 x y^T on the MXU in f32; norms fused in as epilogue adds.
    # HIGHEST precision: coords are C=3 so the matmul is bandwidth-bound
    # anyway, and default-bf16 TPU matmuls lose ~1e-2 absolute accuracy,
    # which breaks nearest-neighbour ordering.
    xx = jnp.sum(x * x, axis=-1, keepdims=True)            # [..., N, 1]
    yy = jnp.sum(y * y, axis=-1, keepdims=True)            # [..., M, 1]
    xy = jnp.einsum(
        "...nc,...mc->...nm",
        x,
        y,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return xx - 2.0 * xy + jnp.swapaxes(yy, -1, -2)


def self_sqdist(x: jax.Array) -> jax.Array:
    """Squared distance of a cloud against itself, [..., N, N]."""
    return pairwise_sqdist(x, x)
