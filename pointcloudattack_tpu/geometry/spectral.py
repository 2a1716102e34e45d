"""Graph-spectral decomposition of point clouds (AOF attack).

Behavioral twin of reference attack/AOF/TAOF_attack.py:31-52: build a
30-NN Gaussian-affinity adjacency, symmetrize the kNN mask, form the
unnormalized Laplacian L = D - A and eigendecompose.

The attack only ever uses the lowest ``low_pass`` (=100) eigenvectors
(TAOF_attack.py:44-52): the low-frequency component is lfc = V V^T pc and
the high-frequency remainder is pc - lfc.  ``lowpass_basis`` therefore
solves just that m-dimensional subspace — by default with LOBPCG on the
spectrally-shifted matrix c*I - L (pure MXU matmuls, ~10 iterations)
instead of the full [N, N] eigh, which is the AOF-path bottleneck on TPU
(SURVEY.md §7 "hard parts").  ``graph_laplacian`` keeps the dense
decomposition for parity checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.knn import knn
from pointcloudattack_tpu.ops.pairwise import self_sqdist


def laplacian_matrix(pc: jax.Array, k: int = 30):
    """kNN-masked Gaussian-affinity Laplacian (TAOF_attack.py:31-52).

    Returns (laplacian [B, N, N], degree [B, N]).
    """
    d = self_sqdist(pc)  # [B, N, N]
    idx = knn(pc, k)  # includes self, like the reference
    n = pc.shape[1]
    mask = jax.nn.one_hot(idx, n, dtype=pc.dtype).sum(axis=2)  # [B, N, N]
    mask = jnp.minimum(mask + jnp.swapaxes(mask, 1, 2), 1.0)
    a = jnp.exp(-d) * mask
    deg = jnp.sum(a, axis=2)
    laplacian = deg[..., :, None] * jnp.eye(n, dtype=pc.dtype) - a
    return laplacian, deg


def graph_laplacian(pc: jax.Array, k: int = 30):
    """Full eigen-decomposition of the graph Laplacian.

    Args:
      pc: [B, N, 3] points.
      k: neighbour count (reference uses 30; the reference's knn includes
        the self-loop in its top-k, TAOF_attack.py:41).

    Returns:
      (eigenvalues [B, N] ascending, eigenvectors [B, N, N]) — both
      gradient-stopped, as the reference computes them under no_grad.
    """
    laplacian, _ = laplacian_matrix(pc, k)
    evals, evecs = jnp.linalg.eigh(laplacian)
    return jax.lax.stop_gradient(evals), jax.lax.stop_gradient(evecs)


def lowpass_basis(
    pc: jax.Array,
    k: int = 30,
    m: int = 100,
    method: str = "auto",
    key: jax.Array | None = None,
):
    """Lowest-m eigenpairs of the graph Laplacian.

    Args:
      pc: [B, N, 3] points.
      k: kNN neighbour count for the affinity graph.
      m: subspace size (the attack's ``low_pass``, reference default 100).
      method: "lobpcg" | "dense" | "auto" (lobpcg when its 5m < N
        requirement holds, dense otherwise).
      key: PRNG key for the LOBPCG start block (fixed default).

    Returns:
      (eigenvalues [B, m] ascending, eigenvectors [B, N, m]),
      gradient-stopped.

    The LOBPCG path solves the top-m eigenpairs of c*I - L with
    c = 2*deg_max + 1 (a Gershgorin upper bound on L's spectrum), which
    are exactly the lowest-m of L.  Its per-iteration cost is [N, N] x
    [N, ~3m] matmuls — MXU-friendly, unlike XLA's full eigh.
    """
    n = pc.shape[1]
    laplacian, deg = laplacian_matrix(pc, k)
    if method == "auto":
        method = "lobpcg" if 5 * m < n else "dense"
    if method == "dense":
        evals, evecs = jnp.linalg.eigh(laplacian)
        return (
            jax.lax.stop_gradient(evals[:, :m]),
            jax.lax.stop_gradient(evecs[:, :, :m]),
        )

    from jax.experimental.sparse.linalg import lobpcg_standard

    if key is None:
        key = jax.random.PRNGKey(0)
    shift = 2.0 * jnp.max(deg, axis=1) + 1.0  # [B]
    eye = jnp.eye(n, dtype=pc.dtype)

    def solve(lap_b, shift_b, key_b):
        x0 = jax.random.normal(key_b, (n, m), dtype=pc.dtype)
        # lobpcg's third parameter is its iteration cap, not the
        # subspace size (that is x0's width)
        w, v, _ = lobpcg_standard(shift_b * eye - lap_b, x0, m=100)
        return shift_b - w, v

    keys = jax.random.split(key, pc.shape[0])
    evals, evecs = jax.vmap(solve)(laplacian, shift, keys)
    return jax.lax.stop_gradient(evals), jax.lax.stop_gradient(evecs)


def lowpass_split(pc: jax.Array, basis: jax.Array):
    """Split pc into (lfc, hfc) using a [B, N, m] low-frequency basis.

    lfc = V (V^T pc); hfc = pc - lfc.  With the full eigenbasis this is
    exactly :func:`spectral_split`; with the rank-m basis it is the same
    result at ~N/m of the FLOPs.
    """
    projs = jnp.einsum(
        "bnc,bnm->bmc", pc, basis, precision=jax.lax.Precision.HIGHEST
    )
    lfc = jnp.einsum(
        "bmc,bnm->bnc", projs, basis, precision=jax.lax.Precision.HIGHEST
    )
    return lfc, pc - lfc


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
