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
      method: "chebyshev" | "lobpcg" | "dense" | "auto" (chebyshev when
        the 5m < N subspace-solve regime holds, dense otherwise).
      key: PRNG key for the iterative solvers' start block (fixed
        default).

    Returns:
      (eigenvalues [B, m] ascending, eigenvectors [B, N, m]),
      gradient-stopped.

    Solvers, measured at B=8 N=1024 m=100 on v5e (BENCH.md round 3):
      * "chebyshev" (default in the subspace regime): filtered subspace
        iteration — HIGHEST-precision [N, N] x [N, s] block matmuls
        with a small-matrix whitened Rayleigh-Ritz (two s x s eighs)
        per round.  0.10 s, projector error vs dense 0.003.
      * "lobpcg": jax.experimental lobpcg on c*I - L (c = 2*deg_max + 1
        Gershgorin).  Converges in ~15 iterations but every iteration runs
        a [N, 3m] QR + 3m x 3m eigh — 0.60 s, projector error 0.125
        (boundary eigenvalues cluster: lam_100 ~ lam_101).
      * "dense": full [N, N] eigh (~0.6 s; the small-N fallback).
    """
    n = pc.shape[1]
    laplacian, deg = laplacian_matrix(pc, k)
    if method == "auto":
        method = "chebyshev" if 5 * m < n else "dense"
    if method == "dense":
        evals, evecs = jnp.linalg.eigh(laplacian)
        return (
            jax.lax.stop_gradient(evals[:, :m]),
            jax.lax.stop_gradient(evecs[:, :, :m]),
        )

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, pc.shape[0])

    if method == "chebyshev":
        evals, evecs = jax.vmap(
            lambda lap_b, deg_b, key_b: _chebyshev_lowpass(
                lap_b, deg_b, m, key_b
            )
        )(laplacian, deg, keys)
        return jax.lax.stop_gradient(evals), jax.lax.stop_gradient(evecs)

    from jax.experimental.sparse.linalg import lobpcg_standard

    shift = 2.0 * jnp.max(deg, axis=1) + 1.0  # [B]
    eye = jnp.eye(n, dtype=pc.dtype)

    def solve(lap_b, shift_b, key_b):
        x0 = jax.random.normal(key_b, (n, m), dtype=pc.dtype)
        # lobpcg's third parameter is its iteration cap, not the
        # subspace size (that is x0's width)
        w, v, _ = lobpcg_standard(shift_b * eye - lap_b, x0, m=100)
        return shift_b - w, v

    evals, evecs = jax.vmap(solve)(laplacian, shift, keys)
    return jax.lax.stop_gradient(evals), jax.lax.stop_gradient(evecs)


# Chebyshev-filtered subspace iteration schedule: oversampling beyond m
# and per-round polynomial degrees.  The cutoff eigenvalues cluster
# (lam_m ~ lam_m+1 for these Laplacians), so convergence needs both the
# oversampled block and several adaptive-cutoff rounds.  Degree is
# f32-CRITICAL: each filter round grows the dominant components by
# ~cosh(d * acosh|g(0)|); at degree >= 8 the block's numerical rank
# collapses below m between Rayleigh-Ritz reorthonormalizations and the
# boundary modes are lost (measured: degree 8 -> projector error 0.92,
# degree 6 -> 5e-4 vs dense at N=1024 m=100 f32; BENCH.md round 3).
_CHEB_OVERSAMPLE = 56
_CHEB_DEGREES = (6,) * 8


def _chebyshev_lowpass(lap: jax.Array, deg: jax.Array, m: int, key):
    """Lowest-m eigenpairs of one [N, N] Laplacian by Chebyshev-filtered
    subspace iteration.

    Each round applies a degree-d Chebyshev polynomial that blows up on
    [0, a) and stays bounded on [a, lam_max] (three-term recurrence —
    d block matmuls, MXU-resident), then Rayleigh-Ritz projects via the
    overlap Cholesky (no [N, s] QR: M = X^T X is s x s).  The cutoff a
    starts at the Gershgorin-scaled guess and is refined each round to
    1.05x the current m-th Ritz value.
    """
    n = lap.shape[0]
    s = min(n, m + _CHEB_OVERSAMPLE)
    lam_max = 2.0 * jnp.max(deg) + 1e-3  # Gershgorin upper bound
    # TPU matmuls default to bf16 — the filter recurrence and the
    # Rayleigh-Ritz products need true f32 or the small-eigenvalue
    # components drown (measured: bf16 projector error 0.84 vs dense)
    hi = jax.lax.Precision.HIGHEST

    def mm(a_, b_):
        return jnp.matmul(a_, b_, precision=hi)

    def cheb_filter(X, a, d):
        e = (lam_max - a) / 2.0
        c = (lam_max + a) / 2.0

        def mul(Y):
            return (mm(lap, Y) - c * Y) / e

        def body(_, carry):
            tm1, t = carry
            tn = 2.0 * mul(t) - tm1
            # per-column rescale (same factor applied to both terms
            # keeps the three-term recurrence valid) prevents overflow
            sc = 1.0 / (jnp.linalg.norm(tn, axis=0, keepdims=True) + 1e-30)
            return (t * sc, tn * sc)

        _, t = jax.lax.fori_loop(0, d - 1, body, (X, mul(X)))
        return t

    def rayleigh_ritz(X):
        """Ritz pairs of the (possibly rank-deficient) block X.

        Filtering collapses near-duplicate columns, so the overlap
        M = X^T X can be numerically singular in f32 — whiten through
        M's OWN eigh instead of a Cholesky (NaN-prone): directions with
        tiny overlap eigenvalues are zeroed and their Ritz diagonal is
        pushed to +inf so they sort after every genuine pair.
        """
        X = X / (jnp.linalg.norm(X, axis=0, keepdims=True) + 1e-30)
        M = 0.5 * (mm(X.T, X) + mm(X.T, X).T)
        wm, um = jnp.linalg.eigh(M)  # ascending
        keep = wm > 1e-5 * wm[-1]
        winv = jnp.where(keep, 1.0 / jnp.sqrt(jnp.abs(wm) + 1e-30), 0.0)
        Y = mm(X, um * winv[None, :])  # whitened block, junk cols ~ 0
        A = mm(Y.T, mm(lap, Y))
        A = 0.5 * (A + A.T)
        # dropped directions would otherwise masquerade as eigenvalue-0
        # modes (L is PSD) — push them past the spectrum's top
        big = 10.0 * lam_max
        A = A + jnp.diag(jnp.where(keep, 0.0, big))
        w, U = jnp.linalg.eigh(A)  # ascending; junk at the tail
        V = mm(Y, U)
        V = V / (jnp.linalg.norm(V, axis=0, keepdims=True) + 1e-30)
        return w, V

    X = jax.random.normal(key, (n, s), dtype=lap.dtype)
    # same clip as the per-round refinement below: an explicit
    # method="chebyshev" outside the 5m < N regime would otherwise start
    # with a cutoff at (or above) lam_max, inverting the filter (and at
    # exactly N = 2m dividing by zero in the Chebyshev map)
    a = jnp.clip(lam_max * (2.0 * m / n), 1e-6, lam_max * 0.9)
    w = jnp.zeros((s,), dtype=lap.dtype)
    for d in _CHEB_DEGREES:
        X = cheb_filter(X, a, d)
        w, X = rayleigh_ritz(X)
        a = jnp.clip(w[m - 1] * 1.05, 1e-6, lam_max * 0.9)
    return w[:m], X[:, :m]


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
