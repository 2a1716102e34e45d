"""Adversarial classification losses (C&W margin family).

Behavioral twins of reference attack/CW/CW_utils/adv_utils.py:6-80.
All functions take logits [B, K] and integer targets [B] and return [B].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_target_other(logits: jax.Array, targets: jax.Array):
    k = logits.shape[-1]
    one_hot = jax.nn.one_hot(targets, k, dtype=logits.dtype)
    real = jnp.sum(one_hot * logits, axis=-1)
    # Mask the target class out of the max with the reference's -10000 trick
    # (attack/CW/CW_utils/adv_utils.py:29-31).
    other = jnp.max((1.0 - one_hot) * logits - one_hot * 10000.0, axis=-1)
    return real, other


def logits_adv_loss(
    logits: jax.Array, targets: jax.Array, kappa: float = 0.0
) -> jax.Array:
    """Targeted margin loss: push target logit above all others by kappa."""
    real, other = _split_target_other(logits, targets)
    return jnp.maximum(other - real + kappa, 0.0)


def untargeted_logits_adv_loss(
    logits: jax.Array, targets: jax.Array, kappa: float = 0.0
) -> jax.Array:
    """Untargeted margin loss: push true logit below the runner-up by kappa."""
    real, other = _split_target_other(logits, targets)
    return jnp.maximum(real - other + kappa, 0.0)


def cross_entropy_adv_loss(
    logits: jax.Array, targets: jax.Array
) -> jax.Array:
    """NLL of the target class (models emit log-probs, so this is NLL).

    Reference attack/CW/CW_utils/adv_utils.py:36-51 uses F.nll_loss on the
    log-softmax outputs.
    """
    k = logits.shape[-1]
    one_hot = jax.nn.one_hot(targets, k, dtype=logits.dtype)
    return -jnp.sum(one_hot * logits, axis=-1)


def negative_logits_adv_loss(
    logits: jax.Array, targets: jax.Array
) -> jax.Array:
    """Negated NLL — maximize the true-class loss (untargeted CE mode)."""
    return -cross_entropy_adv_loss(logits, targets)
