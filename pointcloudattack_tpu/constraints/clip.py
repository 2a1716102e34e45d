"""Perturbation clipping and surface projection.

Behavioral twins of reference attack/CW/CW_utils/clip_utils.py, applied
under stop_gradient in attack loops (the reference applies them inside
``torch.no_grad()`` after each optimizer step).  Channels-last [B, N, 3].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_points_linf(
    pc: jax.Array, ori: jax.Array, budget: float
) -> jax.Array:
    """Scale each point's displacement onto an L2 ball of radius ``budget``.

    (The reference calls this "Linf" because the budget applies per point;
    each per-point displacement is an L2-norm clip.
    Reference attack/CW/CW_utils/clip_utils.py:32-56.)
    """
    diff = pc - ori
    norm = jnp.sqrt(jnp.sum(diff**2, axis=-1, keepdims=True))  # [B, N, 1]
    scale = jnp.minimum(budget / (norm + 1e-9), 1.0)
    return ori + diff * scale


def clip_points_l2(pc: jax.Array, ori: jax.Array, budget: float) -> jax.Array:
    """Scale the whole-cloud displacement onto a global L2 ball.

    Reference attack/CW/CW_utils/clip_utils.py:5-29.
    """
    diff = pc - ori
    norm = jnp.sqrt(jnp.sum(diff**2, axis=(1, 2), keepdims=True))  # [B,1,1]
    scale = jnp.minimum(budget / (norm + 1e-9), 1.0)
    return ori + diff * scale


def project_inner_points(
    pc: jax.Array, ori: jax.Array, normal: jax.Array | None
) -> jax.Array:
    """Project displacements that point inside the surface back onto it.

    For points whose displacement has negative dot with the outward normal,
    replace the displacement with its projection onto the tangent direction
    vref = (normal x diff) x normal; displacements exactly anti-parallel to
    the normal are zeroed.  Reference attack/CW/CW_utils/clip_utils.py:59-108.
    """
    if normal is None:
        return pc
    diff = pc - ori  # [B, N, 3]
    inner = jnp.sum(diff * normal, axis=-1)  # [B, N]
    inner_mask = inner < 0.0

    vng = jnp.cross(normal, diff)  # [B, N, 3]
    vng_norm = jnp.sqrt(jnp.sum(vng**2, axis=-1))  # [B, N]
    vref = jnp.cross(vng, normal)  # [B, N, 3]
    vref_norm = jnp.sqrt(jnp.sum(vref**2, axis=-1))  # [B, N]

    # NOTE: the reference divides elementwise (diff * vref / |vref|), which
    # is what its line clip_utils.py:100-102 literally computes; we keep
    # that exact semantics for parity.
    proj = diff * vref / (vref_norm[..., None] + 1e-9)
    opposite = inner_mask & (vng_norm < 1e-6)
    proj = jnp.where(opposite[..., None], 0.0, proj)
    new_diff = jnp.where(inner_mask[..., None], proj, diff)
    return ori + new_diff


def project_inner_clip_linf(
    pc: jax.Array,
    ori: jax.Array,
    budget: float,
    normal: jax.Array | None = None,
) -> jax.Array:
    """Surface projection followed by per-point clip.

    Reference attack/CW/CW_utils/clip_utils.py:111-136.
    """
    pc = project_inner_points(pc, ori, normal)
    return clip_points_linf(pc, ori, budget)
