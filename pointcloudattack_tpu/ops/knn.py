"""k-nearest-neighbour search over point clouds.

Two flavours exist in the reference and both are preserved:
  * ``knn``: indices of the k nearest points of a cloud against itself,
    self included (reference model/dgcnn.py:194-200 uses top-k of the
    negated distance, so the query point itself is neighbour 0).
  * ``knn_points``: pytorch3d-compatible API returning (dists, idx) of x's
    neighbours in y (reference attack/GeoA3/knn_utils.py:22-55).

Implementation: on TPU, a fused Pallas kernel (MXU distance tile +
iterative VPU argmin selection, VMEM-resident — see
ops/pallas/knn_kernel.py) replaces the ``lax.top_k``-over-[B, N, N] path,
which pays ~9 ms per DGCNN stage in the sort plus the HBM round-trip of
the distance matrix.  Elsewhere (and for shapes outside the kernel's
regime) the XLA path runs; both produce identical indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist, self_sqdist


def knn(x: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest neighbours of each point, self included.

    Args:
      x: [B, N, C] points.
      k: neighbour count.

    Returns:
      [B, N, k] int32 indices (neighbour 0 is the point itself).
    """
    from pointcloudattack_tpu.ops.pallas.knn_kernel import (
        knn_pallas,
        use_knn_kernel,
    )

    if use_knn_kernel(x.shape[1], k):
        # indices carry no tangent; stop-gradient keeps AD off the kernel
        return knn_pallas(jax.lax.stop_gradient(x), k)
    neg = -self_sqdist(x)
    _, idx = jax.lax.top_k(neg, k)
    return idx


def knn_points(
    x: jax.Array, y: jax.Array, k: int, exclude_self: bool = False
):
    """Distances and indices of x's k nearest neighbours in y.

    Args:
      x: [B, N, C] query points.
      y: [B, M, C] database points.
      k: neighbour count.
      exclude_self: drop neighbour 0 (use when x is y and the self-match
        should not count, as GeoA3 does via k+1-then-slice,
        reference attack/GeoA3/knn_utils.py:10-20).

    Returns:
      (dists [B, N, k], idx [B, N, k]) — squared distances, ascending.
    """
    kk = k + 1 if exclude_self else k
    d = pairwise_sqdist(x, y)
    neg, idx = jax.lax.top_k(-d, kk)
    dists = -neg
    if exclude_self:
        dists, idx = dists[..., 1:], idx[..., 1:]
    return dists, idx
