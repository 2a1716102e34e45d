"""Shared model building blocks.

Conventions (framework-wide):
  * inputs are channels-last ``[B, N, 3]`` clouds — every per-point MLP is
    then a plain ``[B*N, C] @ [C, C']`` matmul that XLA tiles onto the MXU
    (the reference's 1x1 Conv1d/Conv2d layers are exactly this, transposed);
  * BatchNorm follows torch defaults (eps=1e-5, momentum 0.1 torch == 0.9
    flax convention) so ported reference checkpoints reproduce activations;
  * models return ``(log_probs, aux)`` where ``aux`` carries the spatial /
    feature transform matrices the reference returns as a 3-tuple
    (reference model/pointnet.py:143-148).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointMLP(nn.Module):
    """Stack of per-point Dense+BN+ReLU layers (= reference 1x1 convs).

    Operates on the last axis of any ``[..., C]`` input.
    """

    features: Sequence[int]
    relu_last: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            if self.relu_last or i < n - 1:
                x = nn.relu(x)
        return x


def max_pool_points(x: jax.Array) -> jax.Array:
    """Global max over the point axis: [B, N, C] -> [B, C]."""
    return jnp.max(x, axis=1)


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """|| T T^t - I ||_F penalty, mean over batch.

    Reference model/pointnet.py:179-186.
    """
    d = trans.shape[-1]
    eye = jnp.eye(d, dtype=trans.dtype)
    ttt = jnp.einsum(
        "bij,bkj->bik", trans, trans, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.mean(jnp.linalg.norm(ttt - eye[None], axis=(1, 2)))
