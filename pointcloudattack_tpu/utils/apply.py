"""Model apply helpers: turn (model, variables) into a plain logits fn."""

from __future__ import annotations

from typing import Any, Callable

import jax


def make_model_fn(
    model: Any, variables: dict
) -> Callable[[jax.Array], jax.Array]:
    """Eval-mode forward closure: x [B, N, 3] -> logits [B, K].

    Attacks differentiate through this; BatchNorm uses stored statistics
    (the reference puts victims in .eval() for every attack,
    reference attack/CW/CW_attack.py:40-43).
    """

    def model_fn(x: jax.Array) -> jax.Array:
        out, _ = model.apply(variables, x, train=False)
        return out

    return model_fn
