"""Pallas TPU kernel: in-kernel neighbour GATHER + MLP chain + max.

The grouped fused chain (dense_max_kernel.mlp_chain_groupmax) removed
the per-layer [B, G, K, C] maps from HBM, but its INPUT — the grouped
edge/SA tensor built by gather + subtract-center + concat — is itself
the largest remaining stream: DGCNN's EdgeConv materializes
[B, N, k, 2C] per stage (reference model/dgcnn.py:203-227; ~0.7 GB per
stage at B=32, N=1024, k=20, C=128, f32) and PointNet++'s set
abstraction materializes [B, S, K, 3+C] (reference
model/pointnet2_utils.py:107-155), in both directions (forward write +
read, backward write + scatter-add read).  This kernel constructs the
grouped rows INSIDE VMEM from the [B, N, C] source features and the
[B, G, K] neighbour indices, runs the chain + max, and scatters the
input cotangent back with one-hot transpose matmuls — the only HBM
traffic is O(B·N·C) source reads and O(B·G·K) index reads.

Row construction is driven by a static ``layout``: a tuple of segments
  ("diff", src_lo, src_hi, ctr_lo)  gathered src cols minus center cols
  ("pass", src_lo, src_hi)          gathered src cols as-is
  ("center", ctr_lo, ctr_hi)        center cols broadcast over K
concatenated in order.  DGCNN edge features = (("diff", 0, C, 0),
("center", 0, C)) with centers = the source rows themselves; SSG set
abstraction = (("diff", 0, 3, 0), ("pass", 3, 3+C)) with centers =
new_xyz; MSG swaps the two (reference concatenates features first,
model/pointnet2_MSG.py:45-52).

Numerics — BIT-EXACT forward vs gather-then-mlp_chain_groupmax:
the gather runs as ONE one-hot MXU matmul against a precomputed bf16
"gather matrix" holding THREE bit-mask truncation limbs of every
diff-segment column (8+8+8 significand bits reconstruct the f32
exactly; one for bf16 sources; one-hot rows select single values, so
there is no accumulation rounding — ops/limbs.py::bf16_limbs, with its
XLA excess-precision hazard: never build limbs with
``x - f32(bf16(x))``) and ONE round-to-nearest bf16 limb of
every pass-segment column — exactly the truncation the chain's first
bf16 matmul applies to those columns anyway.  The backward scatters
the gathered-row cotangent through 3-limb one-hot transpose matmuls
(f32 accumulation; duplicate indices sum like XLA's scatter-add, in
matmul reduction order).

Parameter cotangents come from ``jax.vjp`` of the unfused reference —
dead code in attacks (only d/dx is demanded) and DCE'd by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pointcloudattack_tpu.ops.limbs import bf16_limbs
from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
    _HAVE_PLTPU,
    _act,
    _act_bwd,
    _dot_bf16,
    _epilogue,
    _groups_per_block,
    _layer_specs,
)

# layout segment kinds
_DIFF, _PASS, _CENTER = "diff", "pass", "center"


def _layout_widths(layout):
    """(diff_cols, pass_cols, chain_in_width)."""
    d = sum(s[2] - s[1] for s in layout if s[0] == _DIFF)
    p = sum(s[2] - s[1] for s in layout if s[0] == _PASS)
    c0 = sum(s[2] - s[1] for s in layout)
    return d, p, c0


def _num_limbs(dtype) -> int:
    """Limbs needed to reconstruct a diff column exactly: bf16 sources
    (compute_dtype=bf16 attacks) ARE a single exact limb — padding to 3
    would triple the gather matmul width for all-zero limbs."""
    return 1 if dtype == jnp.bfloat16 else 3


def build_gather_matrix(src: jax.Array, layout) -> jax.Array:
    """[B, N, nl*D + P] bf16: ``nl = _num_limbs(src.dtype)`` truncation
    limbs of every diff column (exact reconstruction,
    ops/limbs.py::bf16_limbs), then 1 round-to-nearest limb of every
    pass column (identical to the chain's own first-matmul bf16
    truncation of those columns)."""
    diff_cols = [src[..., s[1] : s[2]] for s in layout if s[0] == _DIFF]
    pass_cols = [src[..., s[1] : s[2]] for s in layout if s[0] == _PASS]
    parts = []
    if diff_cols:
        d = jnp.concatenate(diff_cols, axis=-1)
        parts.extend(bf16_limbs(d, _num_limbs(src.dtype)))
    if pass_cols:
        pcat = jnp.concatenate(pass_cols, axis=-1)
        parts.append(pcat.astype(jnp.bfloat16))
    return jnp.concatenate(parts, axis=-1)


def _idx_onehot(idxt, k, gpb, n):
    """[gpb*K, N] bf16 selection one-hot from transposed indices
    idxt [K, gpb] (a [K, 1] column slice avoids an in-kernel
    transpose)."""
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (k, n), 1)
    # ONE [gpb*K, N] one-hot matmul per tile (a per-group [K, N] dot
    # would use K of the MXU's 128 rows — ~16% utilization at k=20)
    return jnp.concatenate(
        [
            (idxt[:, gi : gi + 1] == iota_n).astype(jnp.bfloat16)
            for gi in range(gpb)
        ],
        axis=0,
    )


def _ball_slots(ctr3, xrows, r2, k):
    """In-kernel ball query (round-5 verdict task 3): slot assignment of
    every point for ``gpb`` query balls, replacing the HBM-materialized
    [B, S, N, K] one-hot of ops/ball_query.py's MXU path (~0.5 GB/iter
    on SSG, its measured forward bound — BENCH.md SSG anatomy).

    The squared distances replay ops/pairwise.py::pairwise_sqdist's
    EXACT op sequence (norm epilogues around a HIGHEST-precision MXU
    matmul, same add order); the first-K-in-index-order pick (reference
    model/pointnet2_utils.py:84-104) is an exact-f32 running count
    (roll-scan; counts ≤ N « 2^24).  Membership parity caveat: a point
    whose distance lands WITHIN ~1 ulp of r² can still flip vs the
    unfused query, because XLA's fusion choices already change the
    expansion's last bit BETWEEN PROGRAMS (measured on CPU: a
    self-distance is 0.0 jitted, 2.4e-7 eager) — the unfused path has
    the same sensitivity against itself.  Exact self-coincidence
    (distance exactly 0 ≤ r²) is stable either way.

    ctr3 [gpb, 3] f32 ball centers, xrows [N, 3] f32 points ->
    (slot [gpb, N] f32 in {0..K-1, K=out-of-ball/overflow},
     total [gpb, 1] f32 in-ball count,
     first [gpb, N] f32 fill one-hot: first in-ball point, or point 0
     for empty balls — the reference's degenerate sort fill).
    """
    xx = jnp.sum(ctr3 * ctr3, axis=-1, keepdims=True)  # [gpb, 1]
    yy = jnp.sum(xrows * xrows, axis=-1, keepdims=True)  # [N, 1]
    xy = jnp.einsum(
        "gc,nc->gn",
        ctr3,
        xrows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sqr = xx - 2.0 * xy + jnp.swapaxes(yy, 0, 1)  # [gpb, N]
    in_ball = sqr <= r2
    from pointcloudattack_tpu.ops.pallas.scan_util import lane_cumsum

    cnt = lane_cumsum(in_ball.astype(jnp.float32))
    slot = jnp.where(in_ball, cnt - 1.0, jnp.float32(k))
    total = cnt[:, -1:]
    first = (in_ball & (cnt == 1.0)).astype(jnp.float32)
    col0 = (
        jax.lax.broadcasted_iota(jnp.int32, sqr.shape, 1) == 0
    ).astype(jnp.float32)
    first = jnp.where(total > 0.0, first, col0)
    return slot, total, first


def _ball_onehot(slot, total, first, k, gpb):
    """[gpb*K, N] bf16 selection one-hot from ball slots: row j of group
    g hits the point with slot j, or the group's fill point when the
    ball holds fewer than j+1 points."""
    n = slot.shape[1]
    # int32 iota + cast: Mosaic's tpu.iota only produces integer vectors
    # (a float iota verifies under the CPU interpreter but is rejected on
    # hardware — round-5 v5e screen)
    kio = jax.lax.broadcasted_iota(jnp.int32, (k, n), 0).astype(jnp.float32)
    rows = []
    for gi in range(gpb):
        ohg = (slot[gi : gi + 1, :] == kio).astype(jnp.float32)
        # scalar extract, NOT total[gi:gi+1, :1]: Mosaic cannot broadcast
        # a [1,1] vector along sublanes AND lanes at once ("Broadcast in
        # both sublanes and lanes", v5e), while scalar->vector is native
        validg = kio < total[gi, 0]  # row j live iff j < total
        fillg = jnp.broadcast_to(first[gi : gi + 1, :], (k, n))
        rows.append(jnp.where(validg, ohg, fillg).astype(jnp.bfloat16))
    return jnp.concatenate(rows, axis=0)


def _ball_onehotT(slot, total, first, k, gpb):
    """[N, gpb*K] bf16 TRANSPOSED selection one-hot for the backward
    scatter, built from the SAME forward-orientation slots (the
    distance expansion is order-sensitive at the last ulp, so
    recomputing it transposed could disagree with the forward's
    membership)."""
    n = slot.shape[1]
    slot_t = jnp.swapaxes(slot, 0, 1)  # [N, gpb]
    first_t = jnp.swapaxes(first, 0, 1)
    kio = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1).astype(jnp.float32)
    cols = []
    for gi in range(gpb):
        ohg = (slot_t[:, gi : gi + 1] == kio).astype(jnp.float32)
        validg = kio < total[gi, 0]  # scalar extract — see _ball_onehot
        fillg = jnp.broadcast_to(first_t[:, gi : gi + 1], (n, k))
        cols.append(jnp.where(validg, ohg, fillg).astype(jnp.bfloat16))
    return jnp.concatenate(cols, axis=1)


def _build_rows(layout, k, gpb, n, d, nl, gm, ctr, oh):
    """Construct and return the [gpb*K, C0] chain input rows in VMEM.

    gm [N, nl*D+P] bf16 gather matrix, ctr [gpb, Cc] f32 centers,
    oh [gpb*K, N] bf16 selection one-hot (from indices or ball slots).
    """
    g = _dot_bf16(oh, gm)  # [gpb*K, nl*D+P] f32
    if d:
        exact = g[:, :d]
        for li in range(1, nl):
            exact = exact + g[:, li * d : (li + 1) * d]

    def _ctr_rep(lo, w):  # [gpb*K, w]: each group's center row over K
        return jnp.concatenate(
            [
                jnp.broadcast_to(ctr[gi : gi + 1, lo : lo + w], (k, w))
                for gi in range(gpb)
            ],
            axis=0,
        )

    segs = []
    doff = 0
    poff = nl * d
    for s in layout:
        w = s[2] - s[1]
        if s[0] == _DIFF:
            segs.append(exact[:, doff : doff + w] - _ctr_rep(s[3], w))
            doff += w
        elif s[0] == _PASS:
            segs.append(g[:, poff : poff + w])
            poff += w
        else:  # center broadcast over K
            segs.append(_ctr_rep(s[1], w))
    return jnp.concatenate(segs, axis=-1)  # [gpb*K, C0]


def _sel_onehot(ball_r2, k, n, gpb, ctr, sel_ref, transposed=False):
    """Selection one-hot for a tile: from transposed indices (``ball_r2
    is None`` — sel_ref holds idxt [1, 1, K, gpb]) or from an in-kernel
    ball query (sel_ref holds the point rows [1, N, 3] and the first 3
    center columns are the ball centers)."""
    if ball_r2 is None:
        assert not transposed
        return _idx_onehot(sel_ref[0, 0], k, gpb, n)
    slots = _ball_slots(ctr[:, :3], sel_ref[0], ball_r2, k)
    if transposed:
        return slots, _ball_onehot(*slots, k, gpb)
    return _ball_onehot(*slots, k, gpb)


def _gather_fwd_kernel(
    layout, k, n, d, nl, num_layers, slope, pre_act, ball_r2,
    gm_ref, ctr_ref, idxt_ref, *refs,
):
    """Grid (B, ng): outputs (y, argmax) [1, 1, gpb, C_L].

    ``pre_act`` applies the activation to the constructed rows BEFORE
    the chain (CurveNet residual LPFA: leaky_relu(diff + folded
    xyz2feature) — see models/curvenet.py).

    ``ball_r2`` (static float or None) switches the selection source:
    None gathers by the given indices; a radius² runs the ball query
    INSIDE the kernel (idxt_ref then holds the [1, N, 3] point rows
    and the centers' first 3 columns are the ball centers), so the
    [B, S, N, K] slot one-hot of ops/ball_query.py never exists in HBM.

    Blocked arrays carry an explicit ng axis so every block's trailing
    two dims EQUAL the overall dims — Mosaic rejects blocks whose
    sublane/lane dims are neither (8,128)-divisible nor equal to the
    overall (gpb is 1/2/4 for large K; idxt's lane dim IS gpb)."""
    y_ref, idx_out_ref = refs[-2], refs[-1]
    gpb = y_ref.shape[2]
    ctr = ctr_ref[0, 0].astype(jnp.float32)
    oh = _sel_onehot(ball_r2, k, n, gpb, ctr, idxt_ref)
    h = _build_rows(
        layout, k, gpb, n, d, nl, gm_ref[0], ctr, oh,
    )
    if pre_act:
        h = _act(h, slope)
    for layer in range(num_layers):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        z = _epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta)
        if layer < num_layers - 1:
            h = _act(z, slope)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (k, z.shape[-1]), 0)
    ms, idxs = [], []
    for gi in range(gpb):
        seg = z[gi * k : (gi + 1) * k]
        m = jnp.max(seg, axis=0, keepdims=True)
        idxs.append(
            jnp.min(jnp.where(seg == m, kiota, k), axis=0, keepdims=True)
        )
        ms.append(m)
    y_ref[0, 0] = jnp.concatenate(ms, axis=0)
    idx_out_ref[0, 0] = jnp.concatenate(idxs, axis=0).astype(jnp.int32)


def _gather_mean_fwd_kernel(
    layout, k, n, d, nl, num_layers, slope, pre_act, ball_r2,
    gm_ref, ctr_ref, idxt_ref, *refs,
):
    """Mean-pool variant: EVERY layer is activated (the mean does not
    commute with the activation), y [1, 1, gpb, C_L] = segment mean."""
    y_ref = refs[-1]
    gpb = y_ref.shape[2]
    ctr = ctr_ref[0, 0].astype(jnp.float32)
    oh = _sel_onehot(ball_r2, k, n, gpb, ctr, idxt_ref)
    h = _build_rows(
        layout, k, gpb, n, d, nl, gm_ref[0], ctr, oh,
    )
    if pre_act:
        h = _act(h, slope)
    for layer in range(num_layers):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        h = _act(_epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta), slope)
    inv_k = 1.0 / k
    y_ref[0, 0] = jnp.concatenate(
        [
            jnp.sum(h[gi * k : (gi + 1) * k], axis=0, keepdims=True)
            for gi in range(gpb)
        ],
        axis=0,
    ) * inv_k


def _gather_bwd_kernel(
    layout, k, n, d, nl, num_layers, slope, pool, pre_act, ball_r2,
    gm_ref, ctr_ref, idxt_ref, idx_ref, *refs,
):
    """Grid (B, ng): recompute rows + chain, expand the pooled
    cotangent (argmax hit for ``pool="max"``, dense broadcast for
    ``pool="mean"`` whose every layer is activated), back-prop to the
    row cotangent, then split it: gathered-column cotangents scatter
    into the revisited dgather [1, N, D+P] accumulator via 3-limb
    one-hot transpose matmuls; center cotangents reduce over K into
    dctr [1, gpb, Cc].  ``pre_act`` mirrors the forward's row
    activation (cotangent masked by the raw rows' sign).

    ``ball_r2`` as in the forward: the two index refs (idxt, idx4)
    collapse into one [1, N, 3] point-rows ref; the forward one-hot
    and the transposed scatter one-hot are both rebuilt from ONE slot
    computation, so membership can never disagree with itself.
    """
    if pool == "max":
        am_ref, g_ref = refs[-4], refs[-3]
    else:
        am_ref, g_ref = None, refs[-3]
    dg_ref, dctr_ref = refs[-2], refs[-1]
    j = pl.program_id(1)
    gpb = g_ref.shape[2]
    ctr = ctr_ref[0, 0].astype(jnp.float32)
    if ball_r2 is None:
        oh = _sel_onehot(None, k, n, gpb, ctr, idxt_ref)
        ball_slots = None
    else:
        ball_slots, oh = _sel_onehot(
            ball_r2, k, n, gpb, ctr, idxt_ref, transposed=True
        )
    rows = _build_rows(
        layout, k, gpb, n, d, nl, gm_ref[0], ctr, oh,
    )
    h = _act(rows, slope) if pre_act else rows
    masks = []
    n_act = num_layers if pool == "mean" else num_layers - 1
    for layer in range(n_act):
        w, b, mean, mul, beta = refs[5 * layer : 5 * layer + 5]
        z = _epilogue(_dot_bf16(h, w[...]), b, mean, mul, beta)
        masks.append(z > 0.0)
        h = _act(z, slope)

    cout = g_ref.shape[3]
    if pool == "max":
        kiota = jax.lax.broadcasted_iota(jnp.int32, (k, cout), 0)
        segs = []
        for gi in range(gpb):
            hit = am_ref[0, 0, gi][None, :] == kiota
            segs.append(jnp.where(hit, g_ref[0, 0, gi][None, :], 0.0))
        c = jnp.concatenate(segs, axis=0)  # [gpb*K, C_L]
    else:
        # g already carries dy * mul_L / k; broadcast to each segment
        # row and mask through the LAST layer's activation
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
    if pre_act:
        dh = _act_bwd(dh, rows > 0.0, slope)
    # dh [gpb*K, C0]: split by layout — gathered-column cotangents in
    # (all diff cols, then all pass cols) order to match the fwd gather
    # matrix; center cotangents reduce over each group's K rows and
    # embed into [gpb, Cc] via zero-padding concat (segments may
    # overlap the same center columns, e.g. DGCNN — contributions sum)
    cc = ctr_ref.shape[3]

    def _ksum(part):  # [gpb*K, w] -> [gpb, w] per-group row sum
        return jnp.concatenate(
            [
                jnp.sum(part[gi * k : (gi + 1) * k], axis=0, keepdims=True)
                for gi in range(gpb)
            ],
            axis=0,
        )

    def _embed(x, lo):  # [gpb, w] -> [gpb, Cc] at column lo
        pads = []
        if lo:
            pads.append(jnp.zeros((gpb, lo), jnp.float32))
        pads.append(x)
        if cc - lo - x.shape[1]:
            pads.append(jnp.zeros((gpb, cc - lo - x.shape[1]), jnp.float32))
        return jnp.concatenate(pads, axis=1)

    diff_parts, pass_parts = [], []
    dctr = jnp.zeros((gpb, cc), dtype=jnp.float32)
    off = 0
    for s in layout:
        w_ = s[2] - s[1]
        part = dh[:, off : off + w_]
        if s[0] == _DIFF:
            diff_parts.append(part)
            dctr = dctr - _embed(_ksum(part), s[3])
        elif s[0] == _PASS:
            pass_parts.append(part)
        else:
            dctr = dctr + _embed(_ksum(part), s[1])
        off += w_
    dgath = jnp.concatenate(diff_parts + pass_parts, axis=1)
    dctr_ref[0, 0] = dctr

    # scatter dgath [gpb*K, D+P] into the revisited [N, D+P] accumulator
    @pl.when(j == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    if ball_r2 is None:
        iota_nk = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
        idx3 = idx_ref[0, 0]  # [gpb, K]
        # one [N, gpb*K] transpose-scatter per limb (not gpb small ones)
        ohT = jnp.concatenate(
            [
                (iota_nk == idx3[gi : gi + 1, :]).astype(jnp.bfloat16)
                for gi in range(gpb)
            ],
            axis=1,
        )  # [N, gpb*K]
    else:
        ohT = _ball_onehotT(*ball_slots, k, gpb)  # [N, gpb*K]
    acc = dg_ref[0]
    for limb in bf16_limbs(dgath, 3):  # cotangents are f32: 3 limbs
        acc = acc + _dot_bf16(ohT, limb)
    dg_ref[0] = acc


def _pad_group_arrays_ctr(gpb, *arrs):
    """Pad the group axis (axis 1) of each array to a multiple of gpb
    with zeros (padded groups' outputs are sliced off, their backward
    cotangents are zero, and a zero ball-center just selects some valid
    rows that receive zero cotangent)."""
    pad = (-arrs[0].shape[1]) % gpb
    if pad:
        arrs = tuple(
            jnp.pad(a, ((0, 0), (0, pad), (0, 0))) for a in arrs
        )
    return arrs


def _pad_group_arrays(gpb, centers, idx, *extras):
    """Pad the group axis of centers/idx (+ cotangent-side extras) to a
    multiple of gpb.  idx pads with 0 (a valid row — padded groups'
    outputs are sliced off, and their backward cotangent is zero)."""
    return _pad_group_arrays_ctr(gpb, centers, idx, *extras)


@functools.partial(
    jax.jit,
    static_argnames=(
        "layout", "slope", "interpret", "pool", "pre_act", "ball",
    ),
)
def _gather_fwd_pallas(
    src, centers, idx, layers, layout, slope, interpret,
    pool="max", pre_act=False, ball=None,
):
    """``ball``: None = gather by ``idx`` [B, G, K]; (r2, k) = run the
    ball query in-kernel — ``idx`` then holds the [B, N, 3] f32 point
    rows (ball centers = centers[..., :3])."""
    bsz, n, _ = src.shape
    d, p, _ = _layout_widths(layout)
    cout = layers[-1][0].shape[1]
    g = centers.shape[1]
    if ball is None:
        k = idx.shape[2]
        gpb = _groups_per_block(k, g)
        centers_p, idx_p = _pad_group_arrays(gpb, centers, idx)
        ng = idx_p.shape[1] // gpb
        # explicit ng axis (see _gather_fwd_kernel docstring):
        # [B,ng,K,gpb] puts gpb in a block-equal-to-overall lane position
        sel = jnp.swapaxes(
            idx_p.reshape(bsz, ng, gpb, k), 2, 3
        )  # [B, ng, K, gpb]
        sel_spec = pl.BlockSpec((1, 1, k, gpb), lambda i, j: (i, j, 0, 0))
        ball_r2 = None
    else:
        ball_r2, k = ball
        gpb = _groups_per_block(k, g)
        (centers_p,) = _pad_group_arrays_ctr(gpb, centers)
        ng = centers_p.shape[1] // gpb
        sel = idx.astype(jnp.float32)  # [B, N, 3] point rows
        sel_spec = pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0))
    gmat = build_gather_matrix(src, layout)
    cc = centers.shape[2]
    ctr4 = centers_p.reshape(bsz, ng, gpb, cc)
    pspecs, pargs = _layer_specs(layers)
    if pool == "mean":
        kern = functools.partial(
            _gather_mean_fwd_kernel, layout, k, n, d,
            _num_limbs(src.dtype), len(layers), slope, pre_act, ball_r2,
        )
        out_specs = pl.BlockSpec(
            (1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)
        )
        out_shape = jax.ShapeDtypeStruct(
            (bsz, ng, gpb, cout), jnp.float32
        )
    else:
        kern = functools.partial(
            _gather_fwd_kernel, layout, k, n, d, _num_limbs(src.dtype),
            len(layers), slope, pre_act, ball_r2,
        )
        out_specs = [
            pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bsz, ng, gpb, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ng, gpb, cout), jnp.int32),
        ]
    out = pl.pallas_call(
        kern,
        grid=(bsz, ng),
        in_specs=[
            pl.BlockSpec((1, n, gmat.shape[2]), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, gpb, cc), lambda i, j: (i, j, 0, 0)),
            sel_spec,
            *pspecs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(gmat, ctr4, sel, *pargs)
    if pool == "mean":
        return out.reshape(bsz, ng * gpb, cout)[:, :g], None
    y, am = out
    y = y.reshape(bsz, ng * gpb, cout)
    am = am.reshape(bsz, ng * gpb, cout)
    return y[:, :g], am[:, :g]


@functools.partial(
    jax.jit,
    static_argnames=(
        "layout", "slope", "interpret", "pool", "pre_act", "ball",
    ),
)
def _gather_bwd_pallas(
    src, centers, idx, layers, am, gcot, layout, slope, interpret,
    pool="max", pre_act=False, ball=None,
):
    bsz, n, _ = src.shape
    g = centers.shape[1]
    d, p, _ = _layout_widths(layout)
    cout = gcot.shape[-1]
    if ball is None:
        k = idx.shape[2]
        ball_r2 = None
    else:
        ball_r2, k = ball
    gpb = _groups_per_block(k, g)
    if ball is not None:
        if pool == "mean":
            centers_p, gcot_p = _pad_group_arrays_ctr(
                gpb, centers, gcot.astype(jnp.float32)
            )
            am_p = None
        else:
            centers_p, am_p, gcot_p = _pad_group_arrays_ctr(
                gpb, centers, am, gcot.astype(jnp.float32)
            )
        ng = centers_p.shape[1] // gpb
        xrows = idx.astype(jnp.float32)  # [B, N, 3] point rows
        sel_specs = [
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0)),
        ]
        sel_args = [xrows, xrows]  # idxt_ref and idx_ref positions
    elif pool == "mean":
        centers_p, idx_p, gcot_p = _pad_group_arrays(
            gpb, centers, idx, gcot.astype(jnp.float32)
        )
        am_p = None
    else:
        centers_p, idx_p, am_p, gcot_p = _pad_group_arrays(
            gpb, centers, idx, am, gcot.astype(jnp.float32)
        )
    gmat = build_gather_matrix(src, layout)
    cc = centers.shape[2]
    if ball is None:
        ng = idx_p.shape[1] // gpb
        idx4 = idx_p.reshape(bsz, ng, gpb, k)
        idxt = jnp.swapaxes(idx4, 2, 3)  # [B, ng, K, gpb]
        sel_specs = [
            pl.BlockSpec((1, 1, k, gpb), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, gpb, k), lambda i, j: (i, j, 0, 0)),
        ]
        sel_args = [idxt, idx4]
    ctr4 = centers_p.reshape(bsz, ng, gpb, cc)
    gcot4 = gcot_p.reshape(bsz, ng, gpb, cout)
    pspecs, pargs = _layer_specs(layers)
    kern = functools.partial(
        _gather_bwd_kernel, layout, k, n, d, _num_limbs(src.dtype),
        len(layers), slope, pool, pre_act, ball_r2,
    )
    cot_spec = pl.BlockSpec((1, 1, gpb, cout), lambda i, j: (i, j, 0, 0))
    if pool == "mean":
        tail_specs, tail_args = [cot_spec], [gcot4]
    else:
        am4 = am_p.reshape(bsz, ng, gpb, cout)
        tail_specs, tail_args = [cot_spec, cot_spec], [am4, gcot4]
    dgath, dctr = pl.pallas_call(
        kern,
        grid=(bsz, ng),
        in_specs=[
            pl.BlockSpec((1, n, gmat.shape[2]), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, gpb, cc), lambda i, j: (i, j, 0, 0)),
            *sel_specs,
            *pspecs,
            *tail_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, n, d + p), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, gpb, cc), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, d + p), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ng, gpb, cc), jnp.float32),
        ],
        interpret=interpret,
    )(gmat, ctr4, *sel_args, *pargs, *tail_args)
    dctr = dctr.reshape(bsz, ng * gpb, cc)
    # un-concatenate the gathered-column cotangents back to src columns
    dsrc = jnp.zeros(src.shape, jnp.float32)
    doff, poff = 0, d
    for s in layout:
        w = s[2] - s[1]
        if s[0] == _DIFF:
            dsrc = dsrc.at[..., s[1] : s[2]].add(
                dgath[..., doff : doff + w]
            )
            doff += w
        elif s[0] == _PASS:
            dsrc = dsrc.at[..., s[1] : s[2]].add(
                dgath[..., poff : poff + w]
            )
            poff += w
    return dsrc.astype(src.dtype), dctr[:, :g].astype(centers.dtype)


def _reference_rows(src, centers, idx, layout):
    """Unfused row construction: XLA gather + layout assembly (f32)."""
    from pointcloudattack_tpu.ops.gather import index_points

    nbr = index_points(src.astype(jnp.float32), idx)  # [B, G, K, C]
    k = idx.shape[2]
    segs = []
    for s in layout:
        if s[0] == _DIFF:
            segs.append(
                nbr[..., s[1] : s[2]]
                - centers[:, :, None, s[3] : s[3] + (s[2] - s[1])].astype(
                    jnp.float32
                )
            )
        elif s[0] == _PASS:
            # kept f32: the chain's first matmul truncates these
            # columns to bf16 anyway, which is exactly the kernel's
            # 1-limb gather — value-identical through the chain
            segs.append(nbr[..., s[1] : s[2]])
        else:
            segs.append(
                jnp.broadcast_to(
                    centers[:, :, None, s[1] : s[2]].astype(jnp.float32),
                    nbr.shape[:2] + (k, s[2] - s[1]),
                )
            )
    return jnp.concatenate(segs, axis=-1)


def reference_gather_chain_groupmax(
    src, centers, idx, layers, layout, slope: float = 0.0,
    pre_act: bool = False,
):
    """Unfused oracle: XLA gather + row construction + chain + max —
    the exact op sequence the kernel replaces (gathers reconstruct f32
    exactly, matching index_points)."""
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        _act,
        reference_mlp_chain_groupmax,
    )

    grouped = _reference_rows(src, centers, idx, layout)
    if pre_act:
        grouped = _act(grouped, slope)
    return reference_mlp_chain_groupmax(grouped, layers, slope)


def reference_gather_chain_groupmean(
    src, centers, idx, layers, layout, slope: float = 0.0,
    pre_act: bool = False,
):
    """Unfused oracle for the mean-pool variant (every layer
    activated; optional row pre-activation — CurveNet residual LPFA,
    reference curvenet_util.py:203-236)."""
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        _act,
        reference_mlp_chain_groupmean,
    )

    grouped = _reference_rows(src, centers, idx, layout)
    if pre_act:
        grouped = _act(grouped, slope)
    return reference_mlp_chain_groupmean(grouped, layers, slope)


_OP_CACHE: dict = {}


def _make_gather_op(
    layout, slope: float, interpret: bool,
    pool: str = "max", pre_act: bool = False,
):
    reference = (
        reference_gather_chain_groupmean
        if pool == "mean"
        else reference_gather_chain_groupmax
    )

    @jax.custom_vjp
    def op(src, centers, idx, layers):
        y, _ = _gather_fwd_pallas(
            src, centers, idx, layers, layout, slope, interpret,
            pool=pool, pre_act=pre_act,
        )
        return y

    def fwd(src, centers, idx, layers):
        y, am = _gather_fwd_pallas(
            src, centers, idx, layers, layout, slope, interpret,
            pool=pool, pre_act=pre_act,
        )
        return y, (src, centers, idx, layers, am)

    def bwd(res, dy):
        src, centers, idx, layers, am = res
        dy = dy.astype(jnp.float32)
        mul_last = layers[-1][3].astype(jnp.float32)
        g = dy * mul_last[None, None, :]
        if pool == "mean":
            g = g / idx.shape[2]
        dsrc, dctr = _gather_bwd_pallas(
            src, centers, idx, layers, am, g, layout, slope, interpret,
            pool=pool, pre_act=pre_act,
        )
        _, ref_vjp = jax.vjp(
            lambda ls: reference(
                src, centers, idx, ls, layout, slope, pre_act
            ),
            layers,
        )
        (dlayers,) = ref_vjp(dy)
        dlayers = jax.tree_util.tree_map(
            lambda cot, prim: cot.astype(prim.dtype), dlayers, layers
        )
        return dsrc, dctr, None, dlayers

    op.defvjp(fwd, bwd)
    return op


def _make_ball_gather_op(
    layout, slope: float, interpret: bool, radius: float, k: int,
    pool: str = "max",
):
    """Ball-query-in-kernel variant of :func:`_make_gather_op` (round-5
    verdict task 3): op(src, centers, xyz, layers) — indices never
    exist; the selection is recomputed from (xyz, centers[..., :3],
    radius) inside both kernels.  ``xyz`` receives a ZERO cotangent
    (ball membership is an integer selection, exactly like
    query_ball_point's non-differentiable index output)."""
    reference = (
        reference_gather_chain_groupmean
        if pool == "mean"
        else reference_gather_chain_groupmax
    )
    # the comparison constant must match query_ball_point's
    # ``sqr <= radius * radius`` bitwise: double multiply, then the
    # weak-typed f32 cast happens identically in both comparisons
    ball = (radius * radius, k)

    @jax.custom_vjp
    def op(src, centers, xyz, layers):
        y, _ = _gather_fwd_pallas(
            src, centers, xyz, layers, layout, slope, interpret,
            pool=pool, ball=ball,
        )
        return y

    def fwd(src, centers, xyz, layers):
        y, am = _gather_fwd_pallas(
            src, centers, xyz, layers, layout, slope, interpret,
            pool=pool, ball=ball,
        )
        return y, (src, centers, xyz, layers, am)

    def bwd(res, dy):
        src, centers, xyz, layers, am = res
        dy = dy.astype(jnp.float32)
        mul_last = layers[-1][3].astype(jnp.float32)
        g = dy * mul_last[None, None, :]
        if pool == "mean":
            g = g / k
        dsrc, dctr = _gather_bwd_pallas(
            src, centers, xyz, layers, am, g, layout, slope, interpret,
            pool=pool, ball=ball,
        )

        def _ref_layers(ls):
            # layer-grad twin (dead code in attacks, DCE'd): indices
            # via the unfused query — bitwise the same selection
            from pointcloudattack_tpu.ops.ball_query import (
                query_ball_point,
            )

            idx = query_ball_point(radius, k, xyz, centers[..., :3])
            return reference(src, centers, idx, ls, layout, slope)

        _, ref_vjp = jax.vjp(_ref_layers, layers)
        (dlayers,) = ref_vjp(dy)
        dlayers = jax.tree_util.tree_map(
            lambda cot, prim: cot.astype(prim.dtype), dlayers, layers
        )
        return dsrc, dctr, jnp.zeros_like(xyz), dlayers

    op.defvjp(fwd, bwd)
    return op


def ball_gather_chain_groupmax(
    src, centers, xyz, layers, layout, radius: float, nsample: int,
    interpret: bool = False, slope: float = 0.0,
):
    """In-kernel BALL QUERY + gather + L-layer chain + max.

    Fused twin of ``query_ball_point(radius, nsample, xyz, centers)``
    followed by :func:`gather_chain_groupmax` (reference
    model/pointnet2_utils.py:84-155): src [B, N, Cs], centers
    [B, G, Cc] (first 3 columns = ball centers, i.e. new_xyz), xyz
    [B, N, 3] query points -> [B, G, C_L] f32.  Neither the [B, S, N, K]
    slot one-hot of ops/ball_query.py's MXU path (~0.5 GB/iter on SSG —
    the measured forward bound, BENCH.md SSG anatomy) nor the [B, G, K]
    index array itself ever exists; membership is recomputed in-VMEM
    from the coordinates in both directions, with the forward's exact
    pairwise-expansion arithmetic so the selection matches the unfused
    query bitwise.
    """
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        DISPATCH_COUNT,
        pad_last_layer,
    )

    DISPATCH_COUNT["ballq"] += 1
    layers, cout = pad_last_layer(layers)
    key = (
        layout, float(slope), bool(interpret), "max", False,
        "ball", float(radius), int(nsample),
    )
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_ball_gather_op(
            layout, float(slope), bool(interpret),
            float(radius), int(nsample),
        )
    y = _OP_CACHE[key](
        src, centers, xyz, tuple(tuple(l) for l in layers)
    )
    return y[..., :cout]


def gather_chain_groupmax(
    src, centers, idx, layers, layout,
    interpret: bool = False, slope: float = 0.0,
):
    """In-kernel gather + L-layer chain + max over neighbours.

    src [B, N, Cs], centers [B, G, Cc], idx [B, G, K] int32 ->
    [B, G, C_L] f32.  ``layout`` (static tuple, see module docstring)
    defines the chain input columns; ``layers`` as in
    mlp_chain_maxpool; ``slope`` the inter-layer activation.  No
    [B, G, K, *] tensor — grouped input or layer map — touches HBM in
    either direction.
    """
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        DISPATCH_COUNT,
        pad_last_layer,
    )

    DISPATCH_COUNT["gather"] += 1
    layers, cout = pad_last_layer(layers)
    key = (layout, float(slope), bool(interpret), "max", False)
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_gather_op(
            layout, float(slope), bool(interpret)
        )
    y = _OP_CACHE[key](
        src, centers, idx, tuple(tuple(l) for l in layers)
    )
    return y[..., :cout]


def gather_chain_groupmean(
    src, centers, idx, layers, layout,
    interpret: bool = False, slope: float = 0.0, pre_act: bool = False,
):
    """In-kernel gather + (optional row activation) + L-layer chain
    (EVERY layer activated) + mean over neighbours.

    CurveNet's residual LPFA (reference curvenet_util.py:203-236)
    becomes this op after folding xyz2feature+BN into the gather
    sources (models/curvenet.py): rows = act(gather(src) - center),
    then the chain, then the segment mean.
    """
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        DISPATCH_COUNT,
        pad_last_layer,
    )

    DISPATCH_COUNT["gather"] += 1
    layers, cout = pad_last_layer(layers)
    key = (layout, float(slope), bool(interpret), "mean", bool(pre_act))
    if key not in _OP_CACHE:
        _OP_CACHE[key] = _make_gather_op(
            layout, float(slope), bool(interpret),
            pool="mean", pre_act=bool(pre_act),
        )
    y = _OP_CACHE[key](
        src, centers, idx, tuple(tuple(l) for l in layers)
    )
    return y[..., :cout]


def use_gather_chain_kernel(
    n: int, k: int, dims: tuple[int, ...], layout
) -> bool:
    """Dispatch gate: the base grouped-chain gate plus gather-side VMEM
    bounds (one-hot [K·gpb, N] and gather matrix [N, 3D+P] must sit in
    VMEM next to the weights)."""
    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        use_group_chain_kernel,
    )

    if not _HAVE_PLTPU:
        return False
    if not use_group_chain_kernel(k, dims):
        return False
    d, p, _ = _layout_widths(layout)
    if n > 4096 or n * (3 * d + p) * 2 > 8 * 1024 * 1024:
        return False
    return use_mosaic_kernels()


def use_ball_gather_chain_kernel(
    n: int, k: int, dims: tuple[int, ...], layout
) -> bool:
    """Dispatch gate for the ball-query-in-kernel variant: the gather
    gate's bounds apply unchanged (the slot computation adds only
    O(gpb·N) VPU state — smaller than the one-hot it replaces)."""
    return use_gather_chain_kernel(n, k, dims, layout)
