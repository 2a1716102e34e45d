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


def _both_fwd_kernel(n, m, x_ref, yt_ref, rmin_ref, rarg_ref, cmin_ref, carg_ref):
    """One [N, M] distance pass -> both directions' (min, first-argmin).

    Single-block per batch element (the gate bounds N*M so d stays
    VMEM-resident); distances are the exact per-coordinate broadcast of
    ``_kernel`` above.
    """
    x = x_ref[0]  # [N, 3]
    yt = yt_ref[0]  # [3, M]
    d = jnp.zeros((n, m), dtype=jnp.float32)
    for c in range(3):
        diff = x[:, c : c + 1] - yt[c : c + 1, :]
        d = d + diff * diff
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    rmin = jnp.min(d, axis=1, keepdims=True)  # [N, 1]
    rmin_ref[0] = rmin
    rarg_ref[0] = jnp.min(
        jnp.where(d == rmin, lane, m), axis=1, keepdims=True
    )
    cmin = jnp.min(d, axis=0, keepdims=True)  # [1, M]
    cmin_ref[0] = cmin
    carg_ref[0] = jnp.min(
        jnp.where(d == cmin, sub, n), axis=0, keepdims=True
    )


def _both_bwd_kernel(
    n, m, xt_ref, yt_ref, rargl_ref, rargs_ref, cargl_ref, cargs_ref,
    grl_ref, gcl_ref, dxt_ref, dyt_ref,
):
    """VJP of (row_min, col_min) without touching [N, M] HBM: gathers
    and scatters are single-nonzero mask matmuls in the thin [3, .]
    orientation (exact under HIGHEST).  Index vectors arrive in BOTH
    layouts (lane- and sublane-major) so no in-kernel relayout runs."""
    xt = xt_ref[0]  # [3, N]
    yt = yt_ref[0]  # [3, M]
    rargl = rargl_ref[0]  # [1, N] lane-major
    rargs = rargs_ref[0]  # [N, 1] sublane-major
    cargl = cargl_ref[0]  # [1, M]
    cargs = cargs_ref[0]  # [M, 1]
    gr = grl_ref[0]  # [1, N]
    gc = gcl_ref[0]  # [1, M]
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    sub_n = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    sub_m = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    hi = jax.lax.Precision.HIGHEST

    # row direction: nearest-y gather (maskT[j, i] = j == rarg_i), then
    # gx_row = 2 gr (x - y_r(i)) and the scatter of its negation onto y
    mask_rt = (sub_m == rargl).astype(jnp.float32)  # [M, N]
    yrt = jax.lax.dot_general(
        yt, mask_rt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )  # [3, N]
    gxt_row = 2.0 * gr * (xt - yrt)  # [3, N]
    mask_r = (lane_m == rargs).astype(jnp.float32)  # [N, M]
    dyt_row = jax.lax.dot_general(
        -gxt_row, mask_r, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )  # [3, M]

    # column direction, symmetric
    mask_ct = (sub_n == cargl).astype(jnp.float32)  # [N, M]: i == carg_j
    xct = jax.lax.dot_general(
        xt, mask_ct, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )  # [3, M]
    gyt_col = 2.0 * gc * (yt - xct)  # [3, M]
    mask_c = (lane_n == cargs).astype(jnp.float32)  # [M, N]
    dxt_col = jax.lax.dot_general(
        -gyt_col, mask_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )  # [3, N]

    dxt_ref[0] = gxt_row + dxt_col
    dyt_ref[0] = gyt_col + dyt_row


_BOTH_MAX_ELEMS = 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def _both_fwd(x, y, interpret=False):
    b, n, _ = x.shape
    m = y.shape[1]
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    yt = jnp.swapaxes(y, 1, 2)
    outs = pl.pallas_call(
        functools.partial(_both_fwd_kernel, n, m),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        interpret=interpret,
    )(x, yt)
    rmin, rarg, cmin, carg = outs
    return rmin[..., 0], rarg[..., 0], cmin[:, 0], carg[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _both_bwd(x, y, rarg, carg, gr, gc, interpret=False):
    b, n, _ = x.shape
    m = y.shape[1]
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    yt = jnp.swapaxes(y.astype(jnp.float32), 1, 2)
    dxt, dyt = pl.pallas_call(
        functools.partial(_both_bwd_kernel, n, m),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, m), jnp.float32),
        ],
        interpret=interpret,
    )(
        xt, yt,
        rarg[:, None].astype(jnp.int32),
        rarg[..., None].astype(jnp.int32),
        carg[:, None].astype(jnp.int32),
        carg[..., None].astype(jnp.int32),
        gr[:, None].astype(jnp.float32),
        gc[:, None].astype(jnp.float32),
    )
    return jnp.swapaxes(dxt, 1, 2), jnp.swapaxes(dyt, 1, 2)


_BOTH_INTERPRET = False  # tests flip to run the kernel off-TPU


def use_both_kernel(n: int, m: int) -> bool:
    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels

    if not _HAVE_PLTPU or n * m > _BOTH_MAX_ELEMS:
        return False
    # both orientations of the [N, M] masks run in the backward, so
    # both dims sit on lanes at some point
    if n % 128 or m % 128:
        return False
    return use_mosaic_kernels()


@jax.custom_vjp
def min_sqdist_both(x: jax.Array, y: jax.Array):
    """Both directions' nearest-neighbour sqdist from ONE distance pass.

    x [B, N, 3], y [B, M, 3] -> (row_min [B, N], col_min [B, M],
    row_arg [B, N] int32).  The fused kernel serves GeoA3's per-
    iteration Chamfer+Hausdorff+nn bundle (losses/distance.py::
    chamfer_hausdorff_nn, reference GeoA3_attack.py:136-183): the dense
    XLA path materializes [B, N, M] in HBM forward AND backward; here
    neither direction does.  Backward deviation vs the XLA dense path:
    cotangents of tied minima go to the FIRST argmin instead of being
    split across ties (same contract as min_sqdist_rows above).
    """
    rmin, rarg, cmin, _ = _both_impl(x, y)
    return rmin, cmin, rarg


def _both_impl(x, y):
    if use_both_kernel(x.shape[1], y.shape[1]) or _BOTH_INTERPRET:
        return _both_fwd(x, y, interpret=_BOTH_INTERPRET)
    from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist

    d = pairwise_sqdist(x, y)
    return (
        jnp.min(d, axis=-1),
        jnp.argmin(d, axis=-1).astype(jnp.int32),
        jnp.min(d, axis=-2),
        jnp.argmin(d, axis=-2).astype(jnp.int32),
    )


def _both_fwd_rule(x, y):
    rmin, rarg, cmin, carg = _both_impl(x, y)
    return (rmin, cmin, rarg), (x, y, rarg, carg)


def _both_bwd_rule(res, grads):
    x, y, rarg, carg = res
    gr, gc, _ = grads  # no gradient through integer argmin
    if use_both_kernel(x.shape[1], y.shape[1]) or _BOTH_INTERPRET:
        dx, dy = _both_bwd(x, y, rarg, carg, gr, gc, _BOTH_INTERPRET)
        return dx.astype(x.dtype), dy.astype(y.dtype)
    ynear = jnp.take_along_axis(y, rarg[..., None].astype(jnp.int32), -2)
    gx_row = 2.0 * gr[..., None] * (x - ynear)
    xnear = jnp.take_along_axis(x, carg[..., None].astype(jnp.int32), -2)
    gy_col = 2.0 * gc[..., None] * (y - xnear)
    idx_r = jnp.broadcast_to(rarg[..., None].astype(jnp.int32), gx_row.shape)
    dy = _scatter_add(gy_col, idx_r, -gx_row)
    idx_c = jnp.broadcast_to(carg[..., None].astype(jnp.int32), gy_col.shape)
    dx = _scatter_add(gx_row, idx_c, -gy_col)
    return dx, dy


min_sqdist_both.defvjp(_both_fwd_rule, _both_bwd_rule)


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
