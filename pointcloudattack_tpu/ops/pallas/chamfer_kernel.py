"""Tiled Pallas TPU kernel: fused all-pairs sqdist + row-min (+argmin).

This is the framework's hot kernel: Chamfer and Hausdorff distances (and
their gradients) reduce the [N, M] pairwise matrix to per-row minima.
XLA materializes that matrix in HBM for large N; this kernel streams
[TILE_N, TILE_M] tiles through VMEM, keeping running (min, argmin) per
row — O(N + M) HBM traffic instead of O(N * M), which is what makes
N > 10k clouds tractable (SURVEY.md §5.7's "blockwise" requirement).

The backward pass uses the argmin indices: for min_j |x_i - y_j|^2 the
gradient is 2 (x_i - y_{j*(i)}) w.r.t. x_i and the scatter-negation
w.r.t. y — computed in the custom VJP below without re-running the
pairwise computation.

The public entry ``min_sqdist_rows`` auto-selects: Pallas on TPU
backends, a pure-XLA fallback elsewhere (CPU tests run the fallback and,
separately, the kernel in interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled installs
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

TILE_N = 512
TILE_M = 1024
_BIG = 1e10


def _kernel(x_ref, yt_ref, min_ref, idx_ref):
    """Grid (ni, nj); x block [TN, 3], y block [3, TM] (pre-transposed);
    outputs are revisited across the inner j dimension carrying running
    min/argmin.

    The distance is an unrolled 3-coordinate broadcast on the VPU in
    exact f32 — a K=3 MXU matmul would truncate inputs to bf16 and
    scramble nearest-neighbour ordering.
    """
    j = pl.program_id(1)
    tm = yt_ref.shape[1]
    d = jnp.zeros((x_ref.shape[0], tm), dtype=jnp.float32)
    for c in range(3):
        diff = x_ref[:, c : c + 1] - yt_ref[c : c + 1, :]  # [TN, TM]
        d = d + diff * diff

    tile_min = jnp.min(d, axis=1, keepdims=True)  # [TN, 1]
    tile_arg = (
        jnp.argmin(d, axis=1).astype(jnp.int32)[:, None] + j * tm
    )

    @pl.when(j == 0)
    def _():
        min_ref[...] = tile_min
        idx_ref[...] = tile_arg

    @pl.when(j > 0)
    def _():
        prev = min_ref[...]
        better = tile_min < prev
        min_ref[...] = jnp.where(better, tile_min, prev)
        idx_ref[...] = jnp.where(better, tile_arg, idx_ref[...])


def _pad_rows(a: jax.Array, tile: int, fill: float) -> jax.Array:
    n = a.shape[0]
    pad = (-n) % tile
    if pad == 0:
        return a
    return jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _min_rows_pallas_2d(x: jax.Array, y: jax.Array, interpret: bool = False):
    """x [N, 3], y [M, 3] -> (min [N], argmin [M-index per row])."""
    n, m = x.shape[0], y.shape[0]
    xp = _pad_rows(x, TILE_N, 0.0)
    # pad y with far-away sentinels so they never win the min
    yp = _pad_rows(y, TILE_M, _BIG)
    ni, nj = xp.shape[0] // TILE_N, yp.shape[0] // TILE_M
    ypt = yp.T  # [3, M] so the kernel reads coordinate rows lane-major

    grid_spec = pl.GridSpec(
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((TILE_N, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((3, TILE_M), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0)),
        ],
    )
    mins, idx = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.int32),
        ],
        interpret=interpret,
    )(xp.astype(jnp.float32), ypt.astype(jnp.float32))
    return mins[:n, 0], jnp.minimum(idx[:n, 0], m - 1)


def _min_rows_xla(x: jax.Array, y: jax.Array):
    """Reference XLA path: same contract, dense [.., N, M] matrix."""
    from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist

    d = pairwise_sqdist(x, y)
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)


def _use_pallas() -> bool:
    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels

    return _HAVE_PLTPU and use_mosaic_kernels()


@jax.custom_vjp
def min_sqdist_rows(x: jax.Array, y: jax.Array):
    """Per-row nearest-neighbour squared distance min_j |x_i - y_j|^2.

    Args:
      x: [..., N, 3]; y: [..., M, 3] (leading batch dims broadcast via
        vmap inside).

    Returns:
      (mins [..., N], argmin [..., N] int32 indices into M).
    """
    return _min_rows_impl(x, y)


def _min_rows_impl(x, y):
    if _use_pallas():
        fn = _min_rows_pallas_2d
        for _ in range(x.ndim - 2):
            fn = jax.vmap(fn, in_axes=(0, 0))
        return fn(x, y)
    return _min_rows_xla(x, y)


def _fwd(x, y):
    mins, idx = _min_rows_impl(x, y)
    return (mins, idx), (x, y, idx)


def _bwd(res, grads):
    x, y, idx = res
    g_min, _ = grads  # no gradient through integer argmin
    nearest = jnp.take_along_axis(y, idx[..., None], axis=-2)  # [..., N, 3]
    diff = 2.0 * (x - nearest)
    gx = g_min[..., None] * diff
    # scatter-add the negated gradient onto the selected y rows
    gy = jnp.zeros_like(y)
    idx_exp = jnp.broadcast_to(idx[..., None], gx.shape)
    gy = _scatter_add(gy, idx_exp, -gx)
    return gx, gy


def _scatter_add(gy, idx_exp, vals):
    # batched scatter-add along the point axis
    def one(gy2, idx2, val2):
        return gy2.at[idx2[:, 0]].add(val2)

    fn = one
    for _ in range(gy.ndim - 2):
        fn = jax.vmap(fn)
    return fn(gy, idx_exp, vals)


min_sqdist_rows.defvjp(_fwd, _bwd)
