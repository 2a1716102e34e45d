"""Batched point gathering.

Replaces the reference's fancy-indexing helpers
(``index_points``, reference model/pointnet2_utils.py:41-57;
``knn_gather``, reference attack/GeoA3/knn_utils.py:58-86).

Implementation note: the gather is flattened to a single row lookup over
the merged [B*N] axis instead of a batched ``take_along_axis`` — XLA's
TPU lowering of the batched form is ~2x slower (measured 16.2 vs 8.1 ms
at [32, 512, 128, 3] and 6.8 vs 4.3 ms at [32, 1024, 20, 64] on v5e);
results are bitwise identical.
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
    if idx.ndim not in (2, 3):
        raise ValueError(f"idx must be rank 2 or 3, got shape {idx.shape}")
    b, n = points.shape[0], points.shape[1]
    base = (jnp.arange(b, dtype=idx.dtype) * n).reshape(
        (b,) + (1,) * (idx.ndim - 1)
    )
    flat = (idx + base).reshape(-1)
    out = points.reshape((b * n,) + points.shape[2:])[flat]
    return out.reshape(idx.shape + points.shape[2:])


def knn_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """pytorch3d-style gather: x [B, M, C], idx [B, N, K] -> [B, N, K, C]."""
    return index_points(x, idx)


@jax.custom_vjp
def index_points_mm_bwd(points: jax.Array, idx: jax.Array) -> jax.Array:
    """``index_points`` with a scatter-free MXU backward.

    Forward is the flat row lookup (bitwise identical to
    :func:`index_points`, ~0.03 ms at [8, 1024, 16, 3] on v5e); the
    VJP replaces XLA's scatter-add — the cost center of differentiated
    neighbour gathers on TPU (measured 1.2 ms of a 1.25 ms fwd+bwd at
    that shape) — with a one-hot transpose matmul (f32 accumulation, so
    duplicate indices sum exactly like the scatter, only in matmul
    reduction order).  Use for HOT differentiated gathers with small C
    (loss-layer neighbour lookups); plain ``index_points`` stays the
    default elsewhere (for forward-only use the flat lookup ties or
    wins — BENCH.md round-2 negative results).
    """
    return index_points(points, idx)


def _mm_bwd_fwd(points, idx):
    # residuals must be jax types: carry dtype + [N, C...] dims as a
    # batch-0 exemplar (python ints would come back traced)
    exemplar = jnp.zeros((0,) + points.shape[1:], points.dtype)
    return index_points(points, idx), (exemplar, idx)


def _mm_bwd_bwd(res, ct):
    exemplar, idx = res
    dtype = exemplar.dtype
    shape = (idx.shape[0],) + exemplar.shape[1:]
    b, n = shape[0], shape[1]
    c = 1
    for d in shape[2:]:
        c *= d
    flat_idx = idx.reshape(b, -1)  # [B, S*K]
    ct_flat = ct.reshape(b, flat_idx.shape[1], c)
    onehot = jax.nn.one_hot(flat_idx, n, dtype=ct_flat.dtype)  # [B, SK, N]
    dpoints = jnp.einsum(
        "bsn,bsc->bnc",
        onehot,
        ct_flat,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return dpoints.reshape(shape).astype(dtype), None


index_points_mm_bwd.defvjp(_mm_bwd_fwd, _mm_bwd_bwd)
