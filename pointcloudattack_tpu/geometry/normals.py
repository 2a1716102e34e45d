"""Point-cloud normal estimation via local PCA.

TPU-native re-design of reference attack/GeoA3/utility.py:43-152: the
reference loops over the batch and calls ``torch.symeig`` per cloud; here
the [B, N, 3, 3] covariance stack goes through the closed-form 3x3
eigensolver (geometry/eig3.py — pure VPU math; the general batched
``jnp.linalg.eigh`` costs ~250 ms at [64, 1024] on v5e, and SIadv
recomputes normals every iFGM step).  SIadv's open3d-KD-tree normals
(reference attack/SIadv/SIadv_attack.py:205-214) are replaced by the same
kNN-PCA estimator (statistically equivalent; no host round-trip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.geometry.eig3 import sym_eigh_3x3
from pointcloudattack_tpu.ops.gather import index_points
from pointcloudattack_tpu.ops.knn import knn, knn_points


def _local_cov(pc: jax.Array, k: int):
    """Per-point covariance of the k nearest neighbours (self excluded).

    Returns (cov [B, N, 3, 3], centered neighbour sum [B, N, 3]).
    """
    # self-kNN: route through ops.knn.knn (Pallas kernel on TPU) and drop
    # the self match — identical to knn_points(pc, pc, exclude_self=True)
    idx = knn(pc, k + 1)[..., 1:]
    nbrs = index_points(pc, idx)  # [B, N, k, 3]
    mean = jnp.mean(nbrs, axis=2, keepdims=True)
    centered = nbrs - mean
    # bias matches reference fact = 1/(k-1) (utility.py:59)
    cov = jnp.einsum(
        "bnkc,bnkd->bncd",
        centered,
        centered,
        precision=jax.lax.Precision.HIGHEST,
    ) / (k - 1)
    return cov, jnp.sum(centered, axis=2)


def estimate_normal(pc: jax.Array, k: int = 3) -> jax.Array:
    """Unit normals as the smallest-eigenvalue eigenvector of local PCA.

    Sign convention matches reference utility.py:65-67: flip so the normal
    points away from the (centered) neighbour mass.

    Args:
      pc: [B, N, 3].
      k: neighbourhood size, counting neighbours EXCLUDING the point
        itself — the reference queries k+1 and drops the self match
        (utility.py:48-49).  The default 3 is exactly what the GeoA3
        loop passes (GeoA3_attack.py:221, ``estimate_normal(pc, k=3)``).

    Returns:
      [B, N, 3] unit normals (gradient-stopped like the reference's
      ``torch.no_grad``).
    """
    cov, nbr_sum = _local_cov(pc, k)
    # eigh returns ascending eigenvalues -> eigenvector 0 is the normal
    _, vecs = sym_eigh_3x3(cov)
    normal = vecs[..., :, 0]  # [B, N, 3]
    sign = -jnp.sign(jnp.sum(normal * nbr_sum, axis=-1, keepdims=True))
    # exactly-balanced neighbourhoods give sign(0) = 0, which would zero
    # the normal — keep the eigh orientation there
    sign = jnp.where(sign == 0.0, 1.0, sign)
    return jax.lax.stop_gradient(sign * normal)


def estimate_normal_via_ori_normal(
    adv: jax.Array, ori: jax.Array, ori_normal: jax.Array, k: int = 3
) -> jax.Array:
    """Borrow normals from the clean cloud's k nearest neighbours.

    Unmoved points (nearest distance < 1e-6) take their original normal;
    moved points take the normalized mean of the k neighbour normals.
    Reference utility.py:96-116.
    """
    dists, idx = knn_points(adv, ori, k=k)
    nbr_normals = index_points(ori_normal, idx)  # [B, N, k, 3]
    avg = jnp.mean(nbr_normals, axis=2)
    avg = avg / (jnp.linalg.norm(avg, axis=-1, keepdims=True) + 1e-12)
    unmoved = dists[..., 0:1] < 1e-6
    return jnp.where(unmoved, nbr_normals[:, :, 0, :], avg)


def estimate_perpendicular_jitter(
    pc: jax.Array,
    k: int,
    key: jax.Array,
    sigma: float = 0.01,
    clip: float = 0.05,
) -> jax.Array:
    """Random jitter inside each point's tangent plane.

    The two largest-eigenvalue eigenvectors of the local covariance span
    the tangent plane; scale each by clipped gaussian noise
    (reference utility.py:119-152).
    """
    cov, _ = _local_cov(pc, k)
    _, vecs = sym_eigh_3x3(cov)  # ascending
    v1 = vecs[..., :, 2]  # largest
    v2 = vecs[..., :, 1]  # second largest
    b, n, _ = pc.shape
    k1, k2 = jax.random.split(key)
    a1 = sigma * jax.random.normal(k1, (b, n, 1), dtype=pc.dtype)
    a2 = sigma * jax.random.normal(k2, (b, n, 1), dtype=pc.dtype)
    jit = jnp.clip(v1 * a1, -clip, clip) + jnp.clip(v2 * a2, -clip, clip)
    return jax.lax.stop_gradient(jit)
