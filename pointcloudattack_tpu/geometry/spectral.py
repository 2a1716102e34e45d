"""Graph-spectral decomposition of point clouds (AOF attack).

Behavioral twin of reference attack/AOF/TAOF_attack.py:31-52: build a
30-NN Gaussian-affinity adjacency, symmetrize the kNN mask, form the
unnormalized Laplacian L = D - A and eigendecompose.  The [B, N, N] eigh
is batched through XLA's eigh (one call for the whole vmap batch — the
AOF-path bottleneck flagged in SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.knn import knn
from pointcloudattack_tpu.ops.pairwise import self_sqdist


def graph_laplacian(pc: jax.Array, k: int = 30):
    """Eigen-decomposition of the kNN-masked Gaussian-affinity Laplacian.

    Args:
      pc: [B, N, 3] points.
      k: neighbour count (reference uses 30; the reference's knn includes
        the self-loop in its top-k, TAOF_attack.py:41).

    Returns:
      (eigenvalues [B, N] ascending, eigenvectors [B, N, N]) — both
      gradient-stopped, as the reference computes them under no_grad.
    """
    d = self_sqdist(pc)  # [B, N, N]
    idx = knn(pc, k)  # includes self, like the reference
    n = pc.shape[1]
    mask = jax.nn.one_hot(idx, n, dtype=pc.dtype).sum(axis=2)  # [B, N, N]
    mask = jnp.minimum(mask + jnp.swapaxes(mask, 1, 2), 1.0)
    a = jnp.exp(-d) * mask
    deg = jnp.sum(a, axis=2)
    laplacian = deg[..., :, None] * jnp.eye(n, dtype=pc.dtype) - a
    evals, evecs = jnp.linalg.eigh(laplacian)
    return jax.lax.stop_gradient(evals), jax.lax.stop_gradient(evecs)


def spectral_split(pc: jax.Array, evecs: jax.Array, low_pass: int):
    """Split a cloud into low- and high-frequency components.

    Args:
      pc: [B, N, 3].
      evecs: [B, N, N] Laplacian eigenvectors (ascending frequency).
      low_pass: number of low-frequency eigenvectors (reference: 100).

    Returns:
      (lfc [B, N, 3], hfc [B, N, 3]) with lfc + hfc == pc.
    """
    projs = jnp.einsum(
        "bnc,bnm->bmc", pc, evecs, precision=jax.lax.Precision.HIGHEST
    )  # [B, N_modes, 3]
    lfc = jnp.einsum(
        "bmc,bnm->bnc",
        projs[:, :low_pass, :],
        evecs[:, :, :low_pass],
        precision=jax.lax.Precision.HIGHEST,
    )
    hfc = jnp.einsum(
        "bmc,bnm->bnc",
        projs[:, low_pass:, :],
        evecs[:, :, low_pass:],
        precision=jax.lax.Precision.HIGHEST,
    )
    return lfc, hfc


def spectral_project(pc: jax.Array, evecs: jax.Array, low_pass: int):
    """Re-project a (clipped) cloud onto the low/high frequency basis.

    Used after each clip step (reference TAOF_attack.py:163-172).
    """
    return spectral_split(pc, evecs, low_pass)
