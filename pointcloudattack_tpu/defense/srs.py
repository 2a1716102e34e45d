"""SRS: simple random sampling defense.

Behavioral twin of reference
attack/SIadv/baselines/defense/drop_points/SRS.py:23-39 — drop
``drop_num`` random points per cloud (without replacement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def srs_defense(
    pc: jax.Array, key: jax.Array, drop_num: int = 500
) -> jax.Array:
    """Randomly keep N - drop_num points of each cloud.

    Args:
      pc: [B, N, 3].
      key: PRNG key.
      drop_num: points to drop (reference default 500).

    Returns:
      [B, N - drop_num, 3].
    """
    b, n, _ = pc.shape
    keys = jax.random.split(key, b)
    idx = jax.vmap(lambda k: jax.random.permutation(k, n)[: n - drop_num])(
        keys
    )  # [B, N - drop]
    return jnp.take_along_axis(pc, idx[..., None], axis=1)
