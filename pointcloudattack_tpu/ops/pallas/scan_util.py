"""Shared in-kernel scan primitives for the Pallas TPU kernels.

Mosaic has no ``cumsum`` lowering (round-5 hardware A/B: the kappa v2
forward compiled under the CPU interpreter but raised
"Unimplemented primitive ... cumsum" on v5e), so running counts are a
log2(N)-step Hillis–Steele scan of masked ``pltpu.roll`` shifts — 10
{roll, where, add} passes at N=1024 on the VPU.  Verified on hardware
AND under the interpreter (exact for 0/1 counts in any association
order, which is the only use: selection ranks ≤ N « 2^24 in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # CPU-only environments can import this module for interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except (ImportError, ModuleNotFoundError):  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False


def lane_cumsum(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along the LAST (lane) axis, in-kernel.

    Drop-in for ``jnp.cumsum(x, axis=-1)`` inside Pallas TPU kernels.
    Exact for integer-valued f32 inputs (counts); float inputs deviate
    from the sequential sum only by association order.
    """
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        x = x + jnp.where(col >= s, shifted, jnp.zeros_like(x))
        s *= 2
    return x
