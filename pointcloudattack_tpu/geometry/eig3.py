"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

``jnp.linalg.eigh`` on a [B, N, 3, 3] stack lowers to a general batched
eigensolver that costs ~250 ms at [64, 1024] on v5e — it dominates
normal estimation (geometry/normals.py), which SIadv recomputes every
iFGM step (reference attack/SIadv/SIadv_attack.py:320 recomputes
``get_normal_vector`` per step).  For 3x3 symmetric matrices the
spectrum has a closed form (the trigonometric/Cardano solution, e.g.
Smith 1961): eigenvalues from one acos, eigenvectors as cross products
of rows of (A - lambda I).  Everything is elementwise VPU math over the
[B, N] lanes — ~1000x faster and fully differentiable-free (callers
stop-gradient anyway).

Conventions match jnp.linalg.eigh: eigenvalues ascending, eigenvectors
in the COLUMNS of the returned matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def _eigenvalues(a: jax.Array):
    """Ascending eigenvalues of symmetric [..., 3, 3] (Smith's method)."""
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, _EPS) / 6.0)
    # det((A - qI) / p) / 2 via cofactor expansion
    b00, b11, b22 = d0 / p, d1 / p, d2 / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    r = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    ) / 2.0
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    e_mid = 3.0 * q - e_hi - e_lo
    # p2 ~ 0: (near-)isotropic matrix, all eigenvalues = q
    iso = p2 <= _EPS
    e_lo = jnp.where(iso, q, e_lo)
    e_mid = jnp.where(iso, q, e_mid)
    e_hi = jnp.where(iso, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def _eigenvector(a: jax.Array, lam: jax.Array, fallback: jax.Array):
    """Unit null vector of (A - lam I) as the largest row cross product."""
    eye = jnp.eye(3, dtype=a.dtype)
    m = a - lam[..., None, None] * eye
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nbest = jnp.maximum(n01, jnp.maximum(n02, n12))
    # repeated eigenvalue: the null space is >= 2D and all crosses vanish;
    # any unit vector in it works — use the caller-provided fallback
    v = jnp.where(
        (nbest > _EPS)[..., None],
        best / jnp.sqrt(jnp.maximum(nbest, _EPS))[..., None],
        fallback,
    )
    return v


def sym_eigh_3x3(a: jax.Array):
    """Eigendecomposition of symmetric [..., 3, 3] stacks.

    Returns (eigenvalues [..., 3] ascending, eigenvectors [..., 3, 3]
    with eigenvector i in column [..., :, i]) — same convention as
    jnp.linalg.eigh.  Scale-normalizes internally so f32 conditioning is
    independent of the input magnitude.
    """
    scale = jnp.maximum(
        jnp.max(jnp.abs(a), axis=(-2, -1), keepdims=True), _EPS
    )
    an = a / scale
    evals_n = _eigenvalues(an)

    batch = a.shape[:-2]
    ex = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], dtype=a.dtype), batch + (3,)
    )
    v_lo = _eigenvector(an, evals_n[..., 0], ex)
    v_hi = _eigenvector(an, evals_n[..., 2], ex)
    # middle vector: orthogonal completion (exact for distinct spectra,
    # and a valid basis vector in every degenerate case)
    v_mid = jnp.cross(v_hi, v_lo)
    nm = jnp.sqrt(
        jnp.maximum(jnp.sum(v_mid * v_mid, axis=-1, keepdims=True), _EPS)
    )
    v_mid = v_mid / nm
    # fully isotropic: v_lo == v_hi, cross vanished -> identity basis
    ey = jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0], dtype=a.dtype), batch + (3,)
    )
    v_mid = jnp.where(nm > 1e-6, v_mid, ey)
    # re-orthogonalize v_hi against the (reliable) lo/mid pair
    v_hi = jnp.cross(v_lo, v_mid)

    evecs = jnp.stack([v_lo, v_mid, v_hi], axis=-1)  # columns
    return evals_n * scale[..., 0], evecs
