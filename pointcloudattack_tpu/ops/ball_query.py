"""Radius-ball neighbourhood query with static shapes.

Reproduces the reference's exact fill semantics
(reference model/pointnet2_utils.py:84-104): take the first ``nsample``
in-radius points *in index order*, and pad short neighbourhoods by
repeating the first in-radius index.  The reference gets "first nsample in
index order" by setting out-of-radius entries to N and sorting; here the
same ordering comes from top_k over a rank key that is the point index for
in-radius points and N for the rest — no [B, S, N] sort materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist


def query_ball_point(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    sqr: jax.Array | None = None,
) -> jax.Array:
    """Group up to ``nsample`` points within ``radius`` of each query.

    Args:
      radius: ball radius.
      nsample: static group size.
      xyz: [B, N, 3] all points.
      new_xyz: [B, S, 3] query centroids.
      sqr: optional precomputed ``pairwise_sqdist(new_xyz, xyz)``
        [B, S, N] — multi-scale callers (PointNet++ MSG queries the
        SAME centroid/point sets at several radii, reference
        model/pointnet2_MSG.py:31-41) pass it once instead of paying
        the HIGHEST-precision distance matmul per scale.

    Returns:
      [B, S, nsample] int32 indices into N.
    """
    n = xyz.shape[1]
    if sqr is None:
        sqr = pairwise_sqdist(new_xyz, xyz)  # [B, S, N]
    point_idx = jnp.arange(n, dtype=jnp.int32)  # [N]
    in_ball = sqr <= radius * radius

    from pointcloudattack_tpu.ops.backend import is_tpu_backend

    # The MXU path materializes a [B, S, N, nsample] bf16 one-hot in HBM,
    # so its cost grows linearly in nsample: measured on v5e at
    # [32, 512, 1024] it beats the top_k sort 1.9 vs 5.1 ms at k=32 but
    # loses 13.8 vs 7.1 ms at k=128 — dispatch on the group size.
    if is_tpu_backend() and nsample <= min(n, 64):
        # MXU formulation (2x faster than the top_k sort on v5e): the
        # j-th selected index is sum_i i * [cnt_i == j+1 & in_ball],
        # computed as a fused one-hot matmul over the slot assignment.
        # The default bf16 MXU truncation would corrupt raw indices
        # above 256, so the index is split into (hi, lo) bytes — both
        # < 256, exactly representable in bf16; one-hot entries are
        # exact 0/1 and products accumulate in f32, so the recombined
        # index is exact without paying for HIGHEST (6-pass) matmuls.
        cnt = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1)
        slot = jnp.where(in_ball, cnt - 1, nsample)
        onehot = jax.nn.one_hot(slot, nsample, dtype=jnp.bfloat16)
        hi_lo = jnp.stack(
            [point_idx // 256, point_idx % 256], axis=-1
        ).astype(jnp.bfloat16)  # [N, 2]
        parts = jnp.einsum(
            "bsnk,nc->bskc",
            onehot,
            hi_lo,
            preferred_element_type=jnp.float32,
        )
        gi = (
            parts[..., 0].astype(jnp.int32) * 256
            + parts[..., 1].astype(jnp.int32)
        )
        total = cnt[..., -1]
        first = gi[..., :1]
        valid = (
            jnp.arange(nsample, dtype=jnp.int32)[None, None, :]
            < total[..., None]
        )
        return jnp.where(valid, gi, first)

    # Rank key: index for in-ball points, N for the rest -> top_k(-key)
    # yields the nsample smallest-index in-ball points, then fillers.
    rank = jnp.where(in_ball, point_idx, n).astype(jnp.int32)
    k = min(nsample, n)
    neg_smallest, _ = jax.lax.top_k(-rank, k)  # [B, S, k]
    group_idx = -neg_smallest
    if k < nsample:
        # tiny clouds (N < nsample): pad with out-of-ball sentinels, the
        # fill logic below replaces them with the first in-ball index
        pad = jnp.full(group_idx.shape[:-1] + (nsample - k,), n, jnp.int32)
        group_idx = jnp.concatenate([group_idx, pad], axis=-1)
    # Pad slots (value n) repeat the first in-ball index; if the ball is
    # empty the reference also degenerates to index 0 via its sort.
    first = group_idx[..., :1]
    first = jnp.where(first == n, 0, first)
    return jnp.where(group_idx == n, first, group_idx)
