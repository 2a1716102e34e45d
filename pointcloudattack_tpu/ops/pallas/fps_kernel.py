"""Pallas TPU kernel: farthest point sampling entirely in VMEM.

FPS is the latency bottleneck of PointNet++/CurveNet forwards (SURVEY.md
§7 "hard parts"): ``npoint`` inherently-sequential steps of a running
min-distance update + argmax.  The XLA ``lax.scan`` version pays a full
HLO-while iteration (layout boundaries, fusion breaks) per step.  This
kernel runs the whole recurrence in one invocation with everything VMEM
resident, processing the full batch per step — each step is a handful of
[B, N] VPU ops (the same vectorization the scan gets) with none of the
loop overhead.

Contract matches ops/fps.farthest_point_sample exactly (same recurrence,
same start-point semantics); the public wrapper auto-selects the kernel
on TPU and keeps the scan fallback elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

# above this many B*N f32 elements the working set outgrows VMEM;
# fall back to the scan (16MB VMEM; we keep ~5 live [B, N] buffers)
_VMEM_ELEM_LIMIT = 512 * 1024


def _fps_kernel(npoint: int, x_ref, y_ref, z_ref, start_ref, out_ref):
    """x/y/z [B, N] f32, start [B, 1] int32 -> out [B, npoint] int32."""
    b, n = x_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

    def body(i, carry):
        dist, farthest = carry  # [B, N] f32, [B, 1] int32
        out_ref[...] = jnp.where(out_col == i, farthest, out_ref[...])
        sel = (col == farthest).astype(jnp.float32)  # [B, N] one-hot
        d = jnp.zeros((b, n), dtype=jnp.float32)
        for ref in (x_ref, y_ref, z_ref):
            row = ref[...]
            cen = jnp.sum(row * sel, axis=1, keepdims=True)  # [B, 1]
            diff = row - cen
            d = d + diff * diff
        dist = jnp.minimum(dist, d)
        # first-index argmax via min-over-masked-iota: same tie-breaking
        # as jnp.argmax, but avoids a Mosaic f32->i32 materialization bug
        # that rejects argmax over lane dims <= 128 on v5e
        m = jnp.max(dist, axis=1, keepdims=True)
        farthest = jnp.min(
            jnp.where(dist == m, col, n), axis=1, keepdims=True
        )
        return dist, farthest

    init = (
        jnp.full((b, n), jnp.inf, dtype=jnp.float32),
        start_ref[...],
    )
    jax.lax.fori_loop(0, npoint, body, init)


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(
    xyz: jax.Array, npoint: int, start: jax.Array, interpret: bool = False
) -> jax.Array:
    """Batched FPS: xyz [B, N, 3], start [B] -> [B, npoint] int32."""
    x = xyz[..., 0].astype(jnp.float32)
    y = xyz[..., 1].astype(jnp.float32)
    z = xyz[..., 2].astype(jnp.float32)
    b = xyz.shape[0]
    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        interpret=interpret,
    )(x, y, z, start.reshape(b, 1).astype(jnp.int32))


def use_fps_kernel(batch: int, n: int) -> bool:
    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels

    if not _HAVE_PLTPU or batch * n > _VMEM_ELEM_LIMIT:
        return False
    return use_mosaic_kernels()
