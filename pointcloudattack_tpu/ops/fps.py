"""Farthest point sampling as a ``lax.scan``.

FPS is inherently sequential — each new centroid depends on the running
min-distance field — so the TPU version carries that field through a scan
of ``npoint`` steps (the reference runs the same recurrence as a Python
loop of device-synced steps, reference model/pointnet2_utils.py:60-81).
Each step is one [B, N] distance update + argmax: pure VPU work, fully
fused by XLA, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    *,
    key: jax.Array | None = None,
) -> jax.Array:
    """Iteratively pick the point farthest from all picked so far.

    Args:
      xyz: [B, N, 3] points.
      npoint: number of samples.
      key: PRNG key for the random start point (the reference randomizes
        the seed point, model/pointnet2_utils.py:72; CurveNet pins it to
        index 0, curvenet_util.py:81 — pass ``key=None`` for that).

    Returns:
      [B, npoint] int32 indices of the sampled points.
    """
    b, n, _ = xyz.shape
    if key is None:
        start = jnp.zeros((b,), dtype=jnp.int32)
    else:
        start = jax.random.randint(key, (b,), 0, n, dtype=jnp.int32)

    from pointcloudattack_tpu.ops.pallas.fps_kernel import (
        fps_pallas,
        use_fps_kernel,
    )

    if use_fps_kernel(b, n):
        # VMEM-resident batch-parallel kernel (ops/pallas/fps_kernel.py).
        # Indices carry no gradient, but without the stop_gradient JAX
        # tries (and fails) to linearize the pallas_call when attacks
        # differentiate through a PointNet++ forward.
        return fps_pallas(jax.lax.stop_gradient(xyz), npoint, start)

    init_dist = jnp.full((b, n), jnp.inf, dtype=jnp.float32)

    def step(carry, _):
        dist, farthest = carry
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None], axis=1
        )  # [B, 1, 3]
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return (dist, nxt), farthest

    (_, _), idx = jax.lax.scan(step, (init_dist, start), None, length=npoint)
    return jnp.swapaxes(idx, 0, 1)  # [B, npoint]
