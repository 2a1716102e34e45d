"""bf16 limb decomposition of f32 arrays (shared by the bit-exact MXU
gathers in models/dgcnn.py and ops/pallas/gather_chain_kernel.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bf16_limbs(x: jax.Array, num: int) -> list[jax.Array]:
    """Split f32 ``x`` into ``num`` bf16 limbs with bit-mask truncation.

    The obvious round-trip decomposition ``lo = x - f32(bf16(x))`` is
    FOLDED TO ZERO by XLA's excess-precision simplifier on TPU (it
    treats the f32->bf16->f32 round-trip as the identity), silently
    degrading multi-limb gathers to single-limb bf16.  Masking the low
    16 mantissa bits instead produces the truncated-bf16 value through
    integer ops the simplifier cannot fold; the remainder subtraction is
    exact (same-exponent cancellation), so 3 truncation limbs
    (8+8+8 significand bits) reconstruct the f32 value exactly.

    bf16 inputs ARE a single exact limb (the compute_dtype=bf16 path);
    zero-limb padding would only waste MXU width.  Also traceable
    inside Pallas kernels (bitcast + integer mask lower on Mosaic).
    """
    if x.dtype == jnp.bfloat16:
        return [x]
    x = x.astype(jnp.float32)
    limbs = []
    rem = x
    for _ in range(num - 1):
        hi = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(rem, jnp.int32)
            & jnp.int32(-0x10000),
            jnp.float32,
        )
        limbs.append(hi.astype(jnp.bfloat16))
        rem = rem - hi
    limbs.append(rem.astype(jnp.bfloat16))
    return limbs
