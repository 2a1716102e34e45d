"""Tangent-plane (spin-axis) reparameterization of the SIadv attack.

Behavioral twin of reference attack/SIadv/SIadv_attack.py:217-276: every
point gets an orthonormal frame U whose third row is its normal; the
attack optimizes P' = U (P + (P.N) N) and zeroes the z (normal) gradient
component, making steps shape-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spin_axis_matrix(normal: jax.Array) -> jax.Array:
    """Orthonormal frame per point, [..., N, 3, 3]; row 2 is the normal.

    Handles the |z| -> 1 degenerate pole like the reference
    (SIadv_attack.py:237-247).
    """
    x, y, z = normal[..., 0], normal[..., 1], normal[..., 2]
    denom = jnp.sqrt(jnp.maximum(1.0 - z**2, 1e-12))

    row0 = jnp.stack([y / denom, -x / denom, jnp.zeros_like(z)], axis=-1)
    row1 = jnp.stack([x * z / denom, y * z / denom, -denom], axis=-1)
    u = jnp.stack([row0, row1, normal], axis=-2)  # [..., 3, 3]

    # boundary |z| ~ 1: tangent plane is the xy plane
    s = 1.0 / jnp.sqrt(2.0)
    pole0 = jnp.stack(
        [jnp.full_like(z, s), jnp.full_like(z, -s), jnp.zeros_like(z)],
        axis=-1,
    )
    pole1 = jnp.stack([z * s, z * s, jnp.zeros_like(z)], axis=-1)
    pole2 = jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1
    )
    pole = jnp.stack([pole0, pole1, pole2], axis=-2)

    at_pole = (jnp.abs(z**2 - 1.0) < 1e-4)[..., None, None]
    return jnp.where(at_pole, pole, u)


def to_tangent_frame(points: jax.Array, normal: jax.Array):
    """P -> P' = U (P + (P.N) N).

    Returns (new_points, U, translation) with all pieces needed to invert.
    """
    intercept = jnp.sum(points * normal, axis=-1, keepdims=True)  # [.., N, 1]
    u = spin_axis_matrix(normal)
    translation = intercept * normal  # [..., N, 3]
    shifted = points + translation
    new_points = jnp.einsum(
        "...nij,...nj->...ni", u, shifted,
        precision=jax.lax.Precision.HIGHEST,
    )
    return new_points, u, translation


def from_tangent_frame(
    new_points: jax.Array, u: jax.Array, translation: jax.Array
) -> jax.Array:
    """P = U^T P' - (P.N) N (inverse of :func:`to_tangent_frame`)."""
    back = jnp.einsum(
        "...nji,...nj->...ni", u, new_points,
        precision=jax.lax.Precision.HIGHEST,
    )
    return back - translation
