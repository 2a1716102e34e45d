"""Pallas TPU kernel: fused per-point Dense + eval-BatchNorm + global max.

PointNet's forward (reference model/pointnet.py:104-148) materializes a
[B, N, 1024] feature map (twice — once inside the STN, once on the main
path) only to max-pool it over N immediately.  At the CW-headline config
(B=64, N=1024, f32) those two maps are ~268 MB each; writing them out of
the matmul and reading them back into the reduce is the measured HBM
bottleneck of every PointNet-victim attack family (BENCH.md roofline:
MFU 0.24 f32 / 0.44 bf16, both bandwidth-bound).

This kernel streams row tiles of ``x`` through VMEM, computes
``z = (x @ w + b - mean) * mul + beta`` on the MXU/VPU, and keeps a
running (max, argmax) per feature column — the [N, C_out] map never
touches HBM.  The custom VJP rebuilds the sparse max-pool cotangent
tile-by-tile as a compare-against-argmax mask and feeds it straight into
the ``dz @ w^T`` MXU matmul, so the backward materializes no [N, C_out]
map either.

Numerics: the matmuls truncate operands to bf16 with f32 accumulation —
XLA's DEFAULT precision for f32 dots on TPU, which is what the unfused
``nn.Dense`` path runs.  Elementwise BN math runs in f32.  Argmax ties
break to the LOWEST row index (``jnp.argmax`` semantics); XLA's
``reduce_max`` VJP instead splits the cotangent among ties — for
continuous point clouds ties are measure-zero, and the parity tests
assert gradient equality on tie-free inputs.

ReLU commutes with max (both monotone), so callers that need
relu(bn(dense(x))) pooled apply the relu AFTER the pooled [B, C] output
— bit-identical values, and the relu mask gradient composes correctly
with the argmax cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled installs
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

_TILE_N = 256
_NEG = -3.0e38  # finite -inf stand-in: padded rows never win the max


def _fwd_kernel(n: int, x_ref, w_ref, b_ref, mean_ref, mul_ref, beta_ref,
                y_ref, idx_ref):
    """Grid (B, nt): x [1, T, Cin]; outputs [1, C] revisited over nt."""
    j = pl.program_id(1)
    t = x_ref.shape[1]
    xt = x_ref[0]  # [T, Cin]
    z = jax.lax.dot_general(
        xt.astype(jnp.bfloat16),
        w_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, C]
    z = (z + b_ref[...] - mean_ref[...]) * mul_ref[...] + beta_ref[...]

    rows = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0) + j * t
    z = jnp.where(rows < n, z, _NEG)  # mask pad rows

    tile_max = jnp.max(z, axis=0, keepdims=True)  # [1, C]
    tile_arg = (
        jnp.argmax(z, axis=0).astype(jnp.int32)[None, :] + j * t
    )  # [1, C]

    @pl.when(j == 0)
    def _():
        y_ref[...] = tile_max
        idx_ref[...] = tile_arg

    @pl.when(j > 0)
    def _():
        prev = y_ref[...]
        better = tile_max > prev  # strict: ties keep the earlier row
        y_ref[...] = jnp.where(better, tile_max, prev)
        idx_ref[...] = jnp.where(better, tile_arg, idx_ref[...])


def _bwd_kernel(w_ref, idx_ref, g_ref, dx_ref):
    """Grid (B, nt): dx tile = onehot(argmax-in-tile) * g @ w^T.

    ``g = dy * mul`` is the cotangent at the winning row's pre-BN-scale
    activation; rows that won nothing get exactly zero.
    """
    j = pl.program_id(1)
    t = dx_ref.shape[1]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (t, g_ref.shape[1]), 0
    )
    hit = idx_ref[...] == rows + j * t  # [T, C] (idx broadcasts [1, C])
    m = jnp.where(hit, g_ref[...], 0.0)  # [T, C] f32
    dx_ref[0] = jax.lax.dot_general(
        m.astype(jnp.bfloat16),
        w_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)  # [T, Cin]


def _pad_n(x: jax.Array, tile: int) -> jax.Array:
    pad = (-x.shape[1]) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(x, w, b, mean, mul, beta, interpret=False):
    bsz, n, _ = x.shape
    cout = w.shape[1]
    xp = _pad_n(x, _TILE_N)
    nt = xp.shape[1] // _TILE_N
    f32 = lambda a: a.astype(jnp.float32).reshape(1, -1)
    y, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, n),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, _TILE_N, x.shape[2]), lambda i, j: (i, j, 0)),
            pl.BlockSpec((w.shape[0], cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cout), lambda i, j: (i, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz, cout), jnp.int32),
        ],
        interpret=interpret,
    )(xp, w, f32(b), f32(mean), f32(mul), f32(beta))
    return y, idx


@functools.partial(jax.jit, static_argnames=("n", "dx_dtype", "interpret"))
def _bwd_pallas(w, idx, g, n, dx_dtype, interpret=False):
    """dx [B, n, Cin] from the argmax indices and g = dy * mul."""
    bsz, cout = g.shape
    npad = n + ((-n) % _TILE_N)
    nt = npad // _TILE_N
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((w.shape[0], cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (i, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE_N, w.shape[0]), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, npad, w.shape[0]), dx_dtype),
        interpret=interpret,
    )(w, idx, g.astype(jnp.float32))
    return dx[:, :n]


def reference_dense_bn_maxpool(x, w, b, mean, mul, beta):
    """Unfused oracle: the exact op sequence of Dense + eval-BN + max."""
    z = x @ w + b
    z = (z.astype(jnp.float32) - mean.astype(jnp.float32)) * mul.astype(
        jnp.float32
    ) + beta.astype(jnp.float32)
    return jnp.max(z, axis=1)


def _make_op(interpret: bool):
    """custom_vjp instance with ``interpret`` closed over (jax requires
    custom_vjp nondiff args to LEAD the signature, so a trailing flag
    can't be a nondiff_argnum)."""

    @jax.custom_vjp
    def op(x, w, b, mean, mul, beta):
        y, _ = _fwd_pallas(x, w, b, mean, mul, beta, interpret=interpret)
        return y

    def fwd(x, w, b, mean, mul, beta):
        y, idx = _fwd_pallas(x, w, b, mean, mul, beta, interpret=interpret)
        return y, (x, w, b, mean, mul, idx)

    def bwd(res, dy):
        x, w, b, mean, mul, idx = res
        dy = dy.astype(jnp.float32)
        g = dy * mul.astype(jnp.float32)[None, :]
        dx = _bwd_pallas(
            w, idx, g, n=x.shape[1], dx_dtype=x.dtype, interpret=interpret
        )

        # Parameter cotangents — exact, via the winning rows.  Dead code
        # (XLA-DCE'd) in attack loops, where only dx is demanded.
        win = jnp.take_along_axis(x, idx[:, :, None], axis=1)  # [B,C,Cin]
        win_f = win.astype(jnp.float32)
        dw = jnp.einsum("bci,bc->ic", win_f, g).astype(w.dtype)
        db = jnp.sum(g, axis=0).astype(b.dtype)
        dmean = (-jnp.sum(g, axis=0)).astype(mean.dtype)
        pre = jnp.einsum(
            "bci,ic->bc", win_f, w.astype(jnp.float32)
        ) + b.astype(jnp.float32)
        dmul = jnp.sum(
            dy * (pre - mean.astype(jnp.float32)), axis=0
        ).astype(mul.dtype)
        dbeta = jnp.sum(dy, axis=0).astype(mul.dtype)
        return dx, dw, db, dmean, dmul, dbeta

    op.defvjp(fwd, bwd)
    return op


_OP = _make_op(False)
_OP_INTERPRET = _make_op(True)


def dense_bn_maxpool(x, w, b, mean, mul, beta, interpret=False):
    """max over points of ``(x @ w + b - mean) * mul + beta``.

    x [B, N, Cin] -> [B, Cout] f32.  ``mul``/``beta`` are the folded
    eval-mode BatchNorm scale (``scale * rsqrt(var + eps)``) and bias.
    Fuses reference model/pointnet.py:104-121's conv3+bn3+max (and the
    STN's, :26-36) into one VMEM-resident pass; see module docstring.
    """
    return (_OP_INTERPRET if interpret else _OP)(x, w, b, mean, mul, beta)


def use_dense_max_kernel(n: int, cin: int, cout: int) -> bool:
    """Kernel pays when the pooled map is large and weights fit VMEM."""
    from pointcloudattack_tpu.ops.backend import is_tpu_backend

    if not _HAVE_PLTPU:
        return False
    if cout % 128 or cout < 512 or cin > 512 or n < 64:
        return False
    if cin * cout * 4 > 4 * 1024 * 1024:
        return False
    return is_tpu_backend()
