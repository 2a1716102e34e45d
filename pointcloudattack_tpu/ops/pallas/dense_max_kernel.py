"""Pallas TPU kernels: fused per-point MLP chain + eval-BatchNorm + max.

PointNet's forward (reference model/pointnet.py:104-148) materializes a
[B, N, 1024] feature map (twice — once inside the STN, once on the main
path) plus the [B, N, 64/128] maps feeding it, only to max-pool over N
immediately.  At the CW-headline config (B=64, N=1024, f32) the 1024-wide
maps are ~268 MB each; writing them out of the matmul and reading them
back into the reduce is the measured HBM bottleneck of every
PointNet-victim attack family (BENCH.md roofline: MFU 0.24 f32 / 0.44
bf16, both bandwidth-bound).

``mlp_chain_maxpool`` streams row tiles of ``x`` through VMEM, runs the
whole per-point chain ``h_l = relu((h_{l-1} @ w_l + b_l - mean_l) *
mul_l + beta_l)`` (no relu after the last layer) on the MXU/VPU, and
keeps a running (max, argmax) per final feature column — no intermediate
map ever touches HBM: one pass reads x [B, N, C0] and writes [B, C_L].
The custom VJP recomputes the pre-pool chain tile-by-tile
(flash-attention style), expands the sparse max-pool cotangent as a
compare-against-argmax mask, and back-propagates through the chain's
matmuls entirely in VMEM — the only HBM traffic is re-reading x and
writing dx.

Numerics: matmuls truncate operands to bf16 with f32 accumulation —
XLA's DEFAULT precision for f32 dots on TPU, which is what the unfused
``nn.Dense`` path runs.  Elementwise BN math runs in f32.  Argmax ties
break to the LOWEST row index (``jnp.argmax`` semantics); XLA's
``reduce_max`` VJP instead splits the cotangent among ties — for
continuous point clouds ties are measure-zero, and the parity tests
assert gradient equality on tie-free inputs.

ReLU commutes with max (both monotone), so callers that need
relu(last_layer) pooled apply the relu AFTER the pooled [B, C] output —
bit-identical values, and the relu mask gradient composes correctly
with the argmax cotangent.

Parameter cotangents (dead code in attacks, where only d/dx is
demanded and XLA DCEs the rest) come from ``jax.vjp`` of the unfused
reference chain — exact, and only materialized if a training-style
caller actually differentiates w.r.t. weights through the fused op.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled installs
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

# Rows per grid block of the dense chain kernels.  512 is the measured
# default (round-5 tile A/B on the CW headline, v5e: 256 -> 177.5,
# 512 -> 194.7, 1024 -> 123.4 clouds/s — 512 halves the per-block fixed
# cost, 1024 trips VMEM pressure; BENCH.md "Chain row-tile A/B").  The
# env knob exists for per-hardware tuning — every tile size is
# numerically identical (masked max + first-index argmax combine are
# blocking-invariant, pinned by the hardware parity screen).
_TILE_N = int(os.environ.get("PCA_CHAIN_TILE", "512") or "512")
_NEG = -3.0e38  # finite -inf stand-in: padded rows never win the max


def _dot_bf16(a, b, trans_b=False):
    """bf16-truncated MXU matmul with f32 accumulation (XLA's DEFAULT
    precision for f32 dots on TPU)."""
    dims = (((1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )


def _epilogue(z, b_ref, mean_ref, mul_ref, beta_ref):
    return (z + b_ref[...] - mean_ref[...]) * mul_ref[...] + beta_ref[...]


def _chain_fwd_kernel(n, num_layers, x_ref, *refs):
    """Grid (B, nt): x [1, T, C0]; 5 param refs per layer; outputs
    (y [1, 1, C_L], idx [1, 1, C_L]) revisited across nt with running
    max.  The pooled outputs carry a singleton row axis so the block's
    trailing two dims are (1, C_L) == the overall dims — Mosaic rejects
    a (1, C_L) block over a [B, C_L] array when B > 1 (sublane dim
    neither 8-divisible nor equal to the overall)."""
    y_ref, idx_ref = refs[-2], refs[-1]
    j = pl.program_id(1)
    t = x_ref.shape[1]
    h = x_ref[0].astype(jnp.float32)  # [T, C0]
    for layer in range(num_layers):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        z = _epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta)
        if layer < num_layers - 1:
            h = jnp.maximum(z, 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0) + j * t
    z = jnp.where(rows < n, z, _NEG)  # mask pad rows

    tile_max = jnp.max(z, axis=0, keepdims=True)  # [1, C_L]
    # first row attaining the max (jnp.argmax tie order) via min-iota —
    # reduction-only, the same lowering-safe idiom as the knn kernel
    tile_arg = jnp.min(
        jnp.where(z == tile_max, rows, n + t), axis=0, keepdims=True
    )

    @pl.when(j == 0)
    def _():
        y_ref[0] = tile_max
        idx_ref[0] = tile_arg

    @pl.when(j > 0)
    def _():
        prev = y_ref[0]
        better = tile_max > prev  # strict: ties keep the earlier row
        y_ref[0] = jnp.where(better, tile_max, prev)
        idx_ref[0] = jnp.where(better, tile_arg, idx_ref[0])


def _chain_bwd_kernel(num_layers, x_ref, *refs):
    """Grid (B, nt): recompute the tile's pre-pool chain, expand the
    sparse argmax cotangent, and back-propagate to dx — all in VMEM.

    refs: 5 param refs per layer, then idx [1, 1, C_L], g [1, 1, C_L]
    (g = dy * mul_L, the cotangent at the winner's final matmul output;
    singleton row axis for the same Mosaic block-shape rule as the fwd),
    then the dx [1, T, C0] output.
    """
    idx_ref, g_ref, dx_ref = refs[-3], refs[-2], refs[-1]
    j = pl.program_id(1)
    t = x_ref.shape[1]

    h = x_ref[0].astype(jnp.float32)
    masks = []
    for layer in range(num_layers - 1):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        z = _epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta)
        masks.append(z > 0.0)
        h = jnp.maximum(z, 0.0)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (t, g_ref.shape[-1]), 0
    )
    hit = idx_ref[0] == rows + j * t  # [T, C_L] via [1, C_L] broadcast
    c = jnp.where(hit, g_ref[0], 0.0)  # cotangent at final dot, f32
    for layer in range(num_layers - 1, -1, -1):
        w = refs[5 * layer]
        dh = _dot_bf16(c, w[...], trans_b=True)  # [T, C_{layer-1}]
        if layer > 0:
            mul_prev = refs[5 * (layer - 1) + 3]
            c = jnp.where(masks[layer - 1], dh, 0.0) * mul_prev[...]
    dx_ref[0] = dh.astype(dx_ref.dtype)


def _pad_n(x: jax.Array, tile: int) -> jax.Array:
    pad = (-x.shape[1]) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def _layer_specs(layers):
    """Replicated (non-blocked) specs for each layer's 5 param arrays."""
    specs, args = [], []
    for w, b, mean, mul, beta in layers:
        f32v = lambda a: a.astype(jnp.float32).reshape(1, -1)
        specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
        args.append(w)
        for v in (b, mean, mul, beta):
            specs.append(
                pl.BlockSpec((1, v.shape[-1]), lambda i, j: (0, 0))
            )
            args.append(f32v(v))
    return specs, args


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chain_fwd_pallas(x, layers, interpret=False):
    bsz, n, _ = x.shape
    cout = layers[-1][0].shape[1]
    xp = _pad_n(x, _TILE_N)
    nt = xp.shape[1] // _TILE_N
    pspecs, pargs = _layer_specs(layers)
    y, idx = pl.pallas_call(
        functools.partial(_chain_fwd_kernel, n, len(layers)),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, _TILE_N, x.shape[2]), lambda i, j: (i, j, 0)),
            *pspecs,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, cout), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, cout), jnp.int32),
        ],
        interpret=interpret,
    )(xp, *pargs)
    return y[:, 0], idx[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chain_bwd_pallas(x, layers, idx, g, interpret=False):
    """dx [B, N, C0]: sparse pool cotangent through the chain."""
    bsz, n, c0 = x.shape
    cout = g.shape[1]
    xp = _pad_n(x, _TILE_N)
    nt = xp.shape[1] // _TILE_N
    pspecs, pargs = _layer_specs(layers)
    dx = pl.pallas_call(
        functools.partial(_chain_bwd_kernel, len(layers)),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, _TILE_N, c0), lambda i, j: (i, j, 0)),
            *pspecs,
            pl.BlockSpec((1, 1, cout), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE_N, c0), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, xp.shape[1], c0), x.dtype),
        interpret=interpret,
    )(
        xp,
        *pargs,
        idx[:, None, :],
        g.astype(jnp.float32)[:, None, :],
    )
    return dx[:, :n]


def reference_mlp_chain_maxpool(x, layers):
    """Unfused oracle: the exact op sequence of the fused chain."""
    h = x.astype(jnp.float32)
    for layer_i, (w, b, mean, mul, beta) in enumerate(layers):
        f = lambda a: a.astype(jnp.float32)
        z = (h @ f(w) + f(b) - f(mean)) * f(mul) + f(beta)
        h = jnp.maximum(z, 0.0) if layer_i < len(layers) - 1 else z
    return jnp.max(h, axis=1)


# ---------------------------------------------------------------------------
# Grouped variant: chain + max over the NEIGHBOUR axis of [B, G, K, C]
# (PointNet++ set abstraction, reference model/pointnet2_utils.py:158-199:
# shared MLP over [B, S, nsample, C] grouped tensors, max over nsample).
# Each program covers whole K-segments, so the pool never crosses tiles
# and the output block is written exactly once.
# ---------------------------------------------------------------------------


def _act(z, slope: float):
    """max(z, slope*z): ReLU at slope=0.0, LeakyReLU(slope) otherwise."""
    if slope == 0.0:
        return jnp.maximum(z, 0.0)
    return jnp.maximum(z, slope * z)


def _act_bwd(dh, z_pos, slope: float):
    """Cotangent through _act given the recomputed z>0 mask."""
    if slope == 0.0:
        return jnp.where(z_pos, dh, 0.0)
    return jnp.where(z_pos, dh, slope * dh)


def _group_fwd_kernel(k: int, num_layers, slope, x_ref, *refs):
    """Grid (B, ng): x [1, 1, GPB*K, C0]; outputs (y, idx)
    [1, 1, GPB, C_L].

    Per-segment max/argmax via STATIC slices (gpb is small and static),
    so K needs no sublane alignment — EdgeConv's k=20 works as-is.
    Every blocked array carries an explicit ng axis so the block's
    trailing two dims EQUAL the overall dims — Mosaic rejects blocks
    whose sublane dim is neither 8-divisible nor equal to the overall
    (gpb can be 1/2/4 when K is large, e.g. PointNet++ SA2/MSG).
    """
    y_ref, idx_ref = refs[-2], refs[-1]
    h = x_ref[0, 0].astype(jnp.float32)  # [GPB*K, C0]
    for layer in range(num_layers):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        z = _epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta)
        if layer < num_layers - 1:
            h = _act(z, slope)
    gpb = y_ref.shape[2]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (k, z.shape[-1]), 0)
    ms, idxs = [], []
    for gi in range(gpb):
        seg = z[gi * k : (gi + 1) * k]  # [K, C_L]
        m = jnp.max(seg, axis=0, keepdims=True)  # [1, C_L]
        # first index attaining the max (jnp.argmax tie order) via
        # min-iota — the same reduction-only idiom as the knn kernel
        idxs.append(
            jnp.min(jnp.where(seg == m, kiota, k), axis=0, keepdims=True)
        )
        ms.append(m)
    y_ref[0, 0] = jnp.concatenate(ms, axis=0)  # [GPB, C_L]
    idx_ref[0, 0] = jnp.concatenate(idxs, axis=0).astype(jnp.int32)


def _group_bwd_kernel(k: int, num_layers, slope, x_ref, *refs):
    """Grid (B, ng): recompute the chain, expand the per-segment argmax
    cotangent, back-propagate to dx [1, 1, GPB*K, C0]."""
    idx_ref, g_ref, dx_ref = refs[-3], refs[-2], refs[-1]
    h = x_ref[0, 0].astype(jnp.float32)
    masks = []
    for layer in range(num_layers - 1):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        z = _epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta)
        masks.append(z > 0.0)
        h = _act(z, slope)

    gpb, cout = g_ref.shape[2], g_ref.shape[3]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (k, cout), 0)
    segs = []
    for gi in range(gpb):
        hit = idx_ref[0, 0, gi][None, :] == kiota  # [K, C_L]
        segs.append(jnp.where(hit, g_ref[0, 0, gi][None, :], 0.0))
    c = jnp.concatenate(segs, axis=0)  # [GPB*K, C_L]
    for layer in range(num_layers - 1, -1, -1):
        w = refs[5 * layer]
        dh = _dot_bf16(c, w[...], trans_b=True)
        if layer > 0:
            mul_prev = refs[5 * (layer - 1) + 3]
            c = _act_bwd(dh, masks[layer - 1], slope) * mul_prev[...]
    dx_ref[0, 0] = dh.astype(dx_ref.dtype)


def _group_mean_fwd_kernel(k: int, num_layers, slope, x_ref, *refs):
    """Mean-pool variant: activation applies to EVERY layer (the mean
    does not commute with it), y [1, 1, GPB, C_L] = per-segment mean."""
    y_ref = refs[-1]
    h = x_ref[0, 0].astype(jnp.float32)
    for layer in range(num_layers):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        h = _act(_epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta), slope)
    gpb = y_ref.shape[2]
    inv_k = 1.0 / k
    y_ref[0, 0] = jnp.concatenate(
        [
            jnp.sum(h[gi * k : (gi + 1) * k], axis=0, keepdims=True)
            for gi in range(gpb)
        ],
        axis=0,
    ) * inv_k  # [GPB, C_L]


def _group_mean_bwd_kernel(k: int, num_layers, slope, x_ref, *refs):
    """Mean-pool backward: dense cotangent dy/k broadcast to each row,
    through every layer's activation mask."""
    g_ref, dx_ref = refs[-2], refs[-1]
    h = x_ref[0, 0].astype(jnp.float32)
    masks = []
    for layer in range(num_layers):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        z = _epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta)
        masks.append(z > 0.0)
        h = _act(z, slope)

    gpb, cout = g_ref.shape[2], g_ref.shape[3]
    # g = dy * mul_L / k, broadcast to every row of its segment
    segs = [
        jnp.broadcast_to(g_ref[0, 0, gi][None, :], (k, cout))
        for gi in range(gpb)
    ]
    c = _act_bwd(jnp.concatenate(segs, axis=0), masks[-1], slope)
    for layer in range(num_layers - 1, -1, -1):
        w = refs[5 * layer]
        dh = _dot_bf16(c, w[...], trans_b=True)
        if layer > 0:
            mul_prev = refs[5 * (layer - 1) + 3]
            c = _act_bwd(dh, masks[layer - 1], slope) * mul_prev[...]
    dx_ref[0, 0] = dh.astype(dx_ref.dtype)


def pad_last_layer(layers, mult: int = 64):
    """Zero-pad the LAST layer's output channels to a multiple of
    ``mult``; returns ``(layers, cout)`` with the original width.

    Lifts the kernels' lane-alignment restriction (Mosaic handles
    64-multiples; CurveNet's initial LPFA is 32-wide and was silently
    never dispatching on hardware).  Padded columns run through the
    epilogue as ``(z + 0 - 0) * 0 + 0 = 0`` and are sliced off by the
    caller; ``jnp.pad``/slice sit OUTSIDE the custom_vjp boundary, so
    parameter/input cotangents flow through their standard transposes
    (slice's vjp zero-pads dy, pad's vjp slices dlayers back).
    """
    w, b, mean, mul, beta = layers[-1]
    cout = w.shape[1]
    pad = (-cout) % mult
    if not pad:
        return layers, cout

    def zf(v):
        return jnp.pad(v, ((0, pad),))

    padded = (
        jnp.pad(w, ((0, 0), (0, pad))), zf(b), zf(mean), zf(mul), zf(beta)
    )
    return (*layers[:-1], padded), cout


def _pad_groups(x: jax.Array, gpb: int) -> jax.Array:
    pad = (-x.shape[1]) % gpb
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return x


def _groups_per_block(k: int, g: int) -> int:
    """Largest divisor of g fitting ~_TILE_N rows, preferring 8-aligned
    row counts (gpb * k % 8 == 0) for clean f32 sublane tiling."""
    best = 1
    for gpb in range(min(max(1, _TILE_N // k), g), 0, -1):
        if g % gpb == 0:
            if (gpb * k) % 8 == 0:
                return gpb
            if best == 1:
                best = gpb
    return best


@functools.partial(jax.jit, static_argnames=("slope", "interpret"))
def _group_fwd_pallas(x, layers, slope=0.0, interpret=False):
    bsz, g, k, c0 = x.shape
    cout = layers[-1][0].shape[1]
    gpb = _groups_per_block(k, g)
    xp = _pad_groups(x, gpb)
    ng = xp.shape[1] // gpb
    # explicit ng axis: every block's trailing two dims equal the
    # overall dims, satisfying Mosaic's block-shape rule for any gpb/K
    xr = xp.reshape(bsz, ng, gpb * k, c0)
    pspecs, pargs = _layer_specs(layers)
    y, idx = pl.pallas_call(
        functools.partial(_group_fwd_kernel, k, len(layers), slope),
        grid=(bsz, ng),
        in_specs=[
            pl.BlockSpec((1, 1, gpb * k, c0), lambda i, j: (i, j, 0, 0)),
            *pspecs,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ng, gpb, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ng, gpb, cout), jnp.int32),
        ],
        interpret=interpret,
    )(xr, *pargs)
    y = y.reshape(bsz, ng * gpb, cout)
    idx = idx.reshape(bsz, ng * gpb, cout)
    return y[:, :g], idx[:, :g]


@functools.partial(jax.jit, static_argnames=("slope", "interpret"))
def _group_mean_fwd_pallas(x, layers, slope=0.0, interpret=False):
    bsz, g, k, c0 = x.shape
    cout = layers[-1][0].shape[1]
    gpb = _groups_per_block(k, g)
    xp = _pad_groups(x, gpb)
    ng = xp.shape[1] // gpb
    xr = xp.reshape(bsz, ng, gpb * k, c0)
    pspecs, pargs = _layer_specs(layers)
    y = pl.pallas_call(
        functools.partial(_group_mean_fwd_kernel, k, len(layers), slope),
        grid=(bsz, ng),
        in_specs=[
            pl.BlockSpec((1, 1, gpb * k, c0), lambda i, j: (i, j, 0, 0)),
            *pspecs,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, ng, gpb, cout), jnp.float32),
        interpret=interpret,
    )(xr, *pargs)
    return y.reshape(bsz, ng * gpb, cout)[:, :g]


@functools.partial(
    jax.jit, static_argnames=("slope", "mean_pool", "interpret")
)
def _group_bwd_pallas(
    x, layers, idx, gcot, slope=0.0, mean_pool=False, interpret=False
):
    bsz, g, k, c0 = x.shape
    cout = gcot.shape[-1]
    gpb = _groups_per_block(k, g)
    xp = _pad_groups(x, gpb)
    ng = xp.shape[1] // gpb
    xr = xp.reshape(bsz, ng, gpb * k, c0)
    pad = ng * gpb - g
    if pad:
        gcot = jnp.pad(gcot, ((0, 0), (0, pad), (0, 0)))
        if idx is not None:
            idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
    gcot = gcot.reshape(bsz, ng, gpb, cout)
    if idx is not None:
        idx = idx.reshape(bsz, ng, gpb, cout)
    pspecs, pargs = _layer_specs(layers)
    if mean_pool:
        kern = functools.partial(
            _group_mean_bwd_kernel, k, len(layers), slope
        )
        tail_specs = [
            pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0))
        ]
        tail_args = [gcot.astype(jnp.float32)]
    else:
        kern = functools.partial(_group_bwd_kernel, k, len(layers), slope)
        tail_specs = [
            pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)),
        ]
        tail_args = [idx, gcot.astype(jnp.float32)]
    dx = pl.pallas_call(
        kern,
        grid=(bsz, ng),
        in_specs=[
            pl.BlockSpec((1, 1, gpb * k, c0), lambda i, j: (i, j, 0, 0)),
            *pspecs,
            *tail_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gpb * k, c0), lambda i, j: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, ng, gpb * k, c0), x.dtype),
        interpret=interpret,
    )(xr, *pargs, *tail_args)
    return dx.reshape(bsz, ng * gpb, k, c0)[:, :g]


def reference_mlp_chain_groupmax(x, layers, slope: float = 0.0):
    """Unfused oracle: chain over [B, G, K, C], max over K."""
    h = x.astype(jnp.float32)
    for layer_i, (w, b, mean, mul, beta) in enumerate(layers):
        f = lambda a: a.astype(jnp.float32)
        z = (h @ f(w) + f(b) - f(mean)) * f(mul) + f(beta)
        h = _act(z, slope) if layer_i < len(layers) - 1 else z
    return jnp.max(h, axis=2)


def reference_mlp_chain_groupmean(x, layers, slope: float = 0.0):
    """Unfused oracle: chain (EVERY layer activated), mean over K."""
    h = x.astype(jnp.float32)
    for w, b, mean, mul, beta in layers:
        f = lambda a: a.astype(jnp.float32)
        h = _act((h @ f(w) + f(b) - f(mean)) * f(mul) + f(beta), slope)
    return jnp.mean(h, axis=2)


def _make_group_op(interpret: bool, slope: float):
    @jax.custom_vjp
    def op(x, layers):
        y, _ = _group_fwd_pallas(x, layers, slope=slope, interpret=interpret)
        return y

    def fwd(x, layers):
        y, idx = _group_fwd_pallas(
            x, layers, slope=slope, interpret=interpret
        )
        return y, (x, layers, idx)

    def bwd(res, dy):
        x, layers, idx = res
        dy = dy.astype(jnp.float32)
        mul_last = layers[-1][3].astype(jnp.float32)
        g = dy * mul_last[None, None, :]
        dx = _group_bwd_pallas(
            x, layers, idx, g, slope=slope, interpret=interpret
        )
        _, ref_vjp = jax.vjp(
            lambda ls: reference_mlp_chain_groupmax(x, ls, slope), layers
        )
        (dlayers,) = ref_vjp(dy)
        dlayers = jax.tree_util.tree_map(
            lambda cot, prim: cot.astype(prim.dtype), dlayers, layers
        )
        return dx, dlayers

    op.defvjp(fwd, bwd)
    return op


def _make_group_mean_op(interpret: bool, slope: float):
    @jax.custom_vjp
    def op(x, layers):
        return _group_mean_fwd_pallas(
            x, layers, slope=slope, interpret=interpret
        )

    def fwd(x, layers):
        y = _group_mean_fwd_pallas(
            x, layers, slope=slope, interpret=interpret
        )
        return y, (x, layers)

    def bwd(res, dy):
        x, layers = res
        k = x.shape[2]
        dy = dy.astype(jnp.float32)
        mul_last = layers[-1][3].astype(jnp.float32)
        g = dy * mul_last[None, None, :] / k
        dx = _group_bwd_pallas(
            x, layers, None, g, slope=slope, mean_pool=True,
            interpret=interpret,
        )
        _, ref_vjp = jax.vjp(
            lambda ls: reference_mlp_chain_groupmean(x, ls, slope), layers
        )
        (dlayers,) = ref_vjp(dy)
        dlayers = jax.tree_util.tree_map(
            lambda cot, prim: cot.astype(prim.dtype), dlayers, layers
        )
        return dx, dlayers

    op.defvjp(fwd, bwd)
    return op


def mlp_chain_groupmax(x, layers, interpret=False, slope: float = 0.0):
    """max over the NEIGHBOUR axis of an L-layer per-point chain.

    x [B, G, K, C0] -> [B, G, C_L] f32: the PointNet++ set-abstraction
    pattern (shared MLP over grouped neighbours, max over nsample —
    reference model/pointnet2_utils.py:158-199) with no [B, G, K, C]
    layer map ever touching HBM.  ``layers`` as in
    :func:`mlp_chain_maxpool`; ``slope`` selects the inter-layer
    activation (0.0 = ReLU, 0.2 = the LeakyReLU of DGCNN/CurveNet);
    no activation after the last layer (a trailing monotone activation
    commutes with the max and is applied to the pooled output by the
    caller).
    """
    DISPATCH_COUNT["group"] += 1
    layers, cout = pad_last_layer(layers)
    key = ("group", bool(interpret), float(slope))
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_group_op(bool(interpret), float(slope))
    y = _OP_CACHE[key](x, tuple(tuple(l) for l in layers))
    return y[..., :cout]


def mlp_chain_groupmean(x, layers, interpret=False, slope: float = 0.0):
    """mean over the NEIGHBOUR axis of an L-layer per-point chain.

    Like :func:`mlp_chain_groupmax` but every layer IS activated (mean
    does not commute with the activation) and the pool is the segment
    mean — CurveNet's LPFA aggregation (reference
    curvenet_util.py:175-236, mean over k after LeakyReLU convs).
    """
    DISPATCH_COUNT["groupmean"] += 1
    layers, cout = pad_last_layer(layers)
    key = ("groupmean", bool(interpret), float(slope))
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_group_mean_op(bool(interpret), float(slope))
    y = _OP_CACHE[key](x, tuple(tuple(l) for l in layers))
    return y[..., :cout]


def use_group_chain_kernel(k: int, dims: tuple[int, ...]) -> bool:
    """dims = (C0, F1, ..., FL) of the grouped chain; K = nsample."""
    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels

    if not _HAVE_PLTPU:
        return False
    # non-64-multiple output widths are zero-padded by pad_last_layer
    # (CurveNet's 32-wide initial LPFA) — size the VMEM check on the
    # padded width
    cout = dims[-1] + (-dims[-1]) % 64
    if k < 4 or k > 512 or len(dims) > 5:
        return False
    if any(d > 1024 for d in dims[:-1]):
        return False
    wbytes = sum(
        a * b * 4 for a, b in zip(dims[:-1], (*dims[1:-1], cout))
    )
    if wbytes > 4 * 1024 * 1024:
        return False
    return use_mosaic_kernels()


_OP_CACHE: dict = {}

# Trace-time dispatch counters: incremented each time a fused entry
# point is actually invoked (i.e. its caller's use_*_kernel gate
# passed).  Lets harnesses (scripts/tpu_parity_fused.py) distinguish
# "kernel engaged and parity holds" from "kernel silently not engaged"
# — a bit-identical A/B row is otherwise ambiguous.  Counts traces,
# not executions (jit caches replay without re-tracing).
DISPATCH_COUNT = {
    "chain": 0, "group": 0, "groupmean": 0, "gather": 0, "ballq": 0,
}


def _make_op(interpret: bool):
    """custom_vjp instance with ``interpret`` closed over (jax requires
    custom_vjp nondiff args to LEAD the signature, so a trailing flag
    can't be a nondiff_argnum).  ``layers`` is a pytree primal input."""

    @jax.custom_vjp
    def op(x, layers):
        y, _ = _chain_fwd_pallas(x, layers, interpret=interpret)
        return y

    def fwd(x, layers):
        y, idx = _chain_fwd_pallas(x, layers, interpret=interpret)
        return y, (x, layers, idx)

    def bwd(res, dy):
        x, layers, idx = res
        dy = dy.astype(jnp.float32)
        mul_last = layers[-1][3].astype(jnp.float32)
        g = dy * mul_last[None, :]
        dx = _chain_bwd_pallas(x, layers, idx, g, interpret=interpret)

        # Parameter cotangents via the unfused reference chain — exact,
        # and XLA-DCE'd in attack loops where only dx is demanded.
        _, ref_vjp = jax.vjp(
            lambda ls: reference_mlp_chain_maxpool(x, ls), layers
        )
        (dlayers,) = ref_vjp(dy)
        dlayers = jax.tree_util.tree_map(
            lambda cot, prim: cot.astype(prim.dtype), dlayers, layers
        )
        return dx, dlayers

    op.defvjp(fwd, bwd)
    return op


def mlp_chain_maxpool(x, layers, interpret=False):
    """max over points of an L-layer per-point Dense+eval-BN(+ReLU) chain.

    x [B, N, C0] -> [B, C_L] f32.  ``layers`` is a tuple of
    ``(w, b, mean, mul, beta)`` per layer, where ``mul``/``beta`` are
    the folded eval-mode BatchNorm scale (``scale * rsqrt(var + eps)``)
    and bias; ReLU is applied between layers, NOT after the last (a
    trailing ReLU commutes with the max — callers apply it to the
    pooled output).  Fuses reference model/pointnet.py:104-121's
    conv1..conv3+bn+max (and the STN's, :26-36) into one VMEM-resident
    pass; see module docstring.
    """
    DISPATCH_COUNT["chain"] += 1
    key = (bool(interpret),)
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_op(bool(interpret))
    return _OP_CACHE[key](x, tuple(tuple(l) for l in layers))


def dense_bn_maxpool(x, w, b, mean, mul, beta, interpret=False):
    """Single-layer convenience wrapper: max_n((x @ w + b - mean) * mul
    + beta) — the L=1 case of :func:`mlp_chain_maxpool`."""
    return mlp_chain_maxpool(x, ((w, b, mean, mul, beta),), interpret)


def reference_dense_bn_maxpool(x, w, b, mean, mul, beta):
    """Unfused oracle for the single-layer wrapper."""
    return reference_mlp_chain_maxpool(x, ((w, b, mean, mul, beta),))


def use_chain_kernel(n: int, dims: tuple[int, ...]) -> bool:
    """dims = (C0, F1, ..., FL).  The kernel pays when the pooled map is
    large and every weight fits VMEM comfortably."""
    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels

    if not _HAVE_PLTPU:
        return False
    cout = dims[-1]
    if cout % 128 or cout < 512 or n < 64 or len(dims) > 5:
        return False
    # VMEM budget: x block [_TILE_N, C0] + transient h [_TILE_N, d] +
    # weights (<= 4 MB below) stay well under the ~16 MB/core VMEM at
    # d <= 1024 (PointNet++ MSG's SA3 concat input is 643-wide)
    if any(d > 1024 for d in dims[:-1]):
        return False
    wbytes = sum(a * b * 4 for a, b in zip(dims[:-1], dims[1:]))
    if wbytes > 4 * 1024 * 1024:
        return False
    return use_mosaic_kernels()


def use_dense_max_kernel(n: int, cin: int, cout: int) -> bool:
    """Single-layer dispatch (kept for callers of dense_bn_maxpool)."""
    return use_chain_kernel(n, (cin, cout))
