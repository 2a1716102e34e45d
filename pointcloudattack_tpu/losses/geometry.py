"""Geometry-aware losses of the GeoA3 attack.

Behavioral twins of reference attack/GeoA3/loss_utils.py.  All channels-last
[B, N, 3]; curvature "kappa" is the mean absolute projection of normalized
neighbour offsets onto the point normal.

Intentional deviation: the reference's pytorch3d shim broadcasts the
squared-norm terms on swapped axes (attack/GeoA3/knn_utils.py:13-15), so
its CROSS-cloud distances are |p1_j|^2 - 2 p1_i.p2_j + |p2_i|^2 instead of
|p1_i - p2_j|^2 (self-kNN is unaffected; the two coincide for unit-norm
points).  We implement the correct metric — see SURVEY.md latent defects
and tests/test_reference_parity2.py::test_knn_shim_norm_swap_defect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.gather import index_points, index_points_mm_bwd
from pointcloudattack_tpu.ops.knn import knn, knn_points
from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist


def _neighbour_offsets(pc: jax.Array, nbrs: jax.Array, idx: jax.Array):
    """[B, N, k, 3] offsets from each point to its k neighbours.

    The gather runs per GeoA3 iteration under grad; the scatter-free
    backward (ops/gather.py::index_points_mm_bwd) replaces XLA's
    scatter-add, the measured cost center of the curvature term.
    """
    gathered = index_points_mm_bwd(nbrs, idx)
    return gathered - pc[:, :, None, :]


def _masked_unit_projection(vec: jax.Array, normal: jax.Array) -> jax.Array:
    """mean_k |unit(vec) . normal| with exact-collision masking, [B, N].

    A stale cached neighbour index can collide with its centre point
    (vec == 0) once the attack moves the cloud; plain normalization then
    has a NaN gradient through ``norm`` at 0 even though the forward is
    finite.  Double-``where`` guards the norm so collisions contribute
    the limit value 0 in forward AND backward — the same semantics the
    fused kernel implements (ops/pallas/kappa_kernel.py ``d0 > 0``
    mask), keeping the two backends aligned.
    """
    sq = jnp.sum(vec * vec, axis=-1, keepdims=True)  # [B, N, k, 1]
    nonzero = sq > 0
    safe = jnp.where(nonzero, vec, 1.0)
    unit = safe / (
        jnp.sqrt(jnp.sum(safe * safe, axis=-1, keepdims=True)) + 1e-12
    )
    proj = jnp.abs(jnp.sum(unit * normal[:, :, None, :], axis=-1))
    proj = jnp.where(nonzero[..., 0], proj, 0.0)
    return jnp.mean(proj, axis=-1)


def self_knn_idx(pc: jax.Array, k: int) -> jax.Array:
    """Self-kNN indices excluding self, [B, N, k].

    Routed through ``ops.knn.knn`` so the fused Pallas kernel serves it
    on TPU (the curvature losses consume only the INDEX SETS, and every
    aggregation over neighbours here is a mean — order-invariant), where
    ``knn_points``'s [B, N, N] ``lax.top_k`` dominated the GeoA3
    iteration (BENCH.md GeoA3 loss-kNN entry).  Index sets are identical
    to the top_k path (ops/pallas/knn_kernel.py); on CPU the dispatch
    falls back to the same top_k.
    """
    return knn(pc, k + 1)[..., 1:]


def nn1_idx(x: jax.Array, y: jax.Array) -> jax.Array:
    """Index of each x point's nearest y point, [B, N].

    ``argmin`` over the pairwise matrix instead of ``top_k(k=1)``; ties
    break to the first occurrence in both.  Indices carry no tangent, so
    the inputs are gradient-stopped (the VJP of the whole [B, N, N]
    product would otherwise be materialized for nothing).
    """
    d = pairwise_sqdist(
        jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)
    )
    return jnp.argmin(d, axis=-1)


def kappa_ori(pc: jax.Array, normal: jax.Array, k: int = 2) -> jax.Array:
    """Curvature proxy of the clean cloud, [B, N].

    Reference attack/GeoA3/loss_utils.py:60-70 (kNN over self, excluding
    self, normalized offsets projected on the normal).
    """
    from pointcloudattack_tpu.ops.pallas.kappa_kernel import (
        kappa_knn_mean,
        use_kappa_kernel,
    )

    if use_kappa_kernel(pc.shape[1], k):
        return kappa_knn_mean(pc, normal, k)
    idx = self_knn_idx(pc, k)
    vec = _neighbour_offsets(pc, pc, idx)  # [B, N, k, 3]
    return _masked_unit_projection(vec, normal)


def kappa_adv(
    adv: jax.Array,
    ori: jax.Array,
    ori_normal: jax.Array,
    k: int = 2,
    nn_idx: jax.Array | None = None,
    self_idx: jax.Array | None = None,
):
    """Curvature proxy of the adversarial cloud + its projected normals.

    Each adv point borrows the normal of its nearest clean point
    (reference attack/GeoA3/loss_utils.py:72-90).  ``nn_idx`` [B, N]
    optionally supplies that nearest-clean-point index so callers that
    also need it for :func:`curvature_loss` run the query once per
    iteration instead of twice (the reference recomputes it,
    loss_utils.py:78 and :99 — identical indices, so sharing is exact).
    ``self_idx`` [B, N, k] optionally supplies the adv self-kNN index
    set (loss_utils.py:83 recomputes it every call); attack loops that
    refresh it every R iterations pass a cached set (indices carry no
    tangent, so caching changes WHICH neighbours average — not the
    gradient path through them).  The k indices in each row must be
    DISTINCT (kNN sets are by construction): the TPU kernel path
    rebuilds the selection as a column-membership mask, so a duplicated
    value would contribute once rather than per-slot.

    Returns (kappa [B, N], normal [B, N, 3]).
    """
    if nn_idx is None:
        nn_idx = nn1_idx(adv, ori)
    normal = index_points(ori_normal, nn_idx)  # [B, N, 3]
    from pointcloudattack_tpu.ops.pallas.kappa_kernel import (
        kappa_knn_mean,
        kappa_knn_mean_from_idx,
        use_kappa_kernel,
    )

    if use_kappa_kernel(adv.shape[1], k):
        # the fused TPU paths: nothing [N, N]- or [B, N, K, 3]-shaped
        # in HBM either direction (ops/pallas/kappa_kernel.py; the hot
        # GeoA3 per-iteration call, BENCH.md anatomy).  With a cached
        # index set the selection-mask rebuild is K compare/or passes
        # instead of the (k+1)-pick argmin loop — the refresh loops'
        # per-iteration saving.
        if self_idx is None:
            return kappa_knn_mean(adv, normal, k), normal
        return kappa_knn_mean_from_idx(adv, normal, self_idx, k), normal
    idx = self_knn_idx(adv, k) if self_idx is None else self_idx
    vec = _neighbour_offsets(adv, adv, idx)
    return _masked_unit_projection(vec, normal), normal


def curvature_loss(
    adv: jax.Array,
    ori: jax.Array,
    adv_kappa: jax.Array,
    ori_kappa: jax.Array,
    nn_idx: jax.Array | None = None,
) -> jax.Array:
    """Mean squared curvature mismatch, adv point vs nearest clean point, [B].

    Reference attack/GeoA3/loss_utils.py:92-105.  ``nn_idx`` [B, N] as in
    :func:`kappa_adv` (same query, shareable).
    """
    if nn_idx is None:
        nn_idx = nn1_idx(adv, ori)
    matched = jnp.take_along_axis(ori_kappa, nn_idx, axis=1)
    return jnp.mean((adv_kappa - matched) ** 2, axis=-1)


def displacement_loss(
    adv: jax.Array, ori: jax.Array, k: int = 16
) -> jax.Array:
    """Neighbourhood-coherence penalty on displacement MAGNITUDES, [B, N].

    Reference attack/GeoA3/loss_utils.py:107-115: theta_i = |adv_i - ori_i|^2
    (a scalar per point); each point is penalized by the mean squared gap
    between its theta and its clean-cloud neighbours' thetas. Shape [B, N]
    like the reference (it returns the per-point map, not a batch scalar).
    """
    idx = self_knn_idx(ori, k)
    theta = jnp.sum((adv - ori) ** 2, axis=-1)  # [B, N]
    nbr_theta = jnp.take_along_axis(
        theta, idx.reshape(theta.shape[0], -1), axis=1
    ).reshape(idx.shape)  # [B, N, k]
    return jnp.mean((nbr_theta - theta[:, :, None]) ** 2, axis=-1)


def knn_smoothing_loss(
    adv: jax.Array, k: int = 5, threshold_coef: float = 1.05
) -> jax.Array:
    """Mean kNN distance of points above a stop-gradient threshold, [B].

    Reference attack/GeoA3/loss_utils.py:143-157.
    """
    dists, _ = knn_points(adv, adv, k=k, exclude_self=True)
    value = jnp.mean(dists, axis=-1)  # [B, N]
    mean = jnp.mean(value, axis=-1, keepdims=True)
    std = jnp.std(value, axis=-1, keepdims=True, ddof=1)
    mask = jax.lax.stop_gradient(
        (value > mean + threshold_coef * std).astype(adv.dtype)
    )
    return jnp.mean(value * mask, axis=-1)
