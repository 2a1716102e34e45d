"""Model apply helpers: turn (model, variables) into a plain logits fn."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def make_model_fn(
    model: Any,
    variables: dict,
    compute_dtype: Any | None = None,
    jit: bool = True,
) -> Callable[[jax.Array], jax.Array]:
    """Eval-mode forward closure: x [B, N, 3] -> logits [B, K].

    Attacks differentiate through this; BatchNorm uses stored statistics
    (the reference puts victims in .eval() for every attack,
    reference attack/CW/CW_attack.py:40-43).

    compute_dtype: cast params and inputs for the forward (e.g.
    ``jnp.bfloat16`` — ~1.9x attack throughput on TPU v5e with logits
    returned in f32; attack state stays f32 either way).

    jit: compile the whole forward as ONE executable (default).  A bare
    ``model.apply`` closure dispatches every primitive individually when
    called outside a jit — on the axon TPU tunnel (~25 ms/dispatch)
    that made one eval-mode PointNet B=32 forward take ~58 s.  Params
    are passed as jit ARGUMENTS (not closure constants), so the
    executable is shared across checkpoints of the same architecture.
    Calls from inside an enclosing jit/grad/vmap simply inline.  Pass
    ``jit=False`` for a raw closure (e.g. to re-wrap with different
    static arguments).
    """
    if compute_dtype is not None:
        cast_vars = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            variables,
        )

        def fwd(v: dict, x: jax.Array) -> jax.Array:
            out, _ = model.apply(v, x.astype(compute_dtype), train=False)
            return out.astype(jnp.float32)

        if jit:
            fwd = jax.jit(fwd)
        return lambda x: fwd(cast_vars, x)

    def fwd(v: dict, x: jax.Array) -> jax.Array:
        out, _ = model.apply(v, x, train=False)
        return out

    if jit:
        fwd = jax.jit(fwd)
    return lambda x: fwd(variables, x)
