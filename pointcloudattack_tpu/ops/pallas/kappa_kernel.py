"""Pallas TPU kernel: fused self-kNN + curvature proxy (GeoA3 kappa).

The GeoA3 curvature term (reference attack/GeoA3/loss_utils.py:72-90)
recomputes, EVERY attack iteration, the adversarial cloud's self-kNN,
gathers the k neighbour coordinates, normalizes the offsets and projects
them on a per-point normal:

    kappa_i = mean_k | unit(a_{j_ik} - a_i) . n_i |

Composed from XLA ops this costs three separate passes over [N, N]-sized
work per iteration (kNN top-k, a [B, N, K, 3] gather whose backward is a
one-hot einsum, and the normalize/project chain) — measured 1.28 ms of
GeoA3's 1.94 ms iteration at B=8, N=1024 on v5e (BENCH.md anatomy).

This kernel computes kappa in ONE fused pass per row-block with nothing
[N, N]-shaped ever touching HBM, using two reformulations:

* bilinear projection: (a_j - a_i) . n_i = P_ij - P_ii with
  P = n @ a^T off the MXU, and |a_j - a_i| = sqrt(d_ij) from the same
  exact 3-coordinate VPU distance used by the Chamfer kernel — so the
  neighbour COORDINATES are never gathered at all;
* threshold reconstruction: after the k+1 argmin picks the selected set
  is exactly the (k+1) lexicographically smallest (d, col) pairs, so the
  backward rebuilds the selection mask from FOUR per-row scalars (the
  first pick (m0, i0) = the reference's excluded self column,
  loss_utils.py:83's knn(k+1)[1:], and the last pick (T, iK)) instead of
  per-pick one-hot masks; the neighbour-side scatter then rides two thin
  [3, R] x [R, N] MXU matmuls.

Numerics vs the XLA composition: the projection numerator is evaluated
as n.a_j - n.a_i (catastrophic-cancellation-free to ~1e-7 absolute),
not as n.(a_j - a_i); distances are exact f32. Relative deviation on
unit-scale clouds is ~1e-5 (tests/test_pallas_kappa.py pins it), far
inside the attack's f32 deviation budget (scripts/tpu_parity_fused.py
screens grad cosine at 0.995). For an EXACT-duplicate neighbour the XLA
path emits NaN gradients (0/0 in the normalize); this kernel emits the
limit value 0 for both the forward contribution and the gradient.
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

_EPS = 1e-12


def _exact_sqdist(xr, xat, n):
    """[R, 3] rows vs [3, N] all -> exact f32 [R, N] (chamfer_kernel.py:51
    pattern: per-coordinate VPU broadcast, no expansion cancellation)."""
    d = jnp.zeros((xr.shape[0], n), dtype=jnp.float32)
    for c in range(3):
        diff = xr[:, c : c + 1] - xat[c : c + 1, :]
        d = d + diff * diff
    return d


def _proj(nr, xat, n):
    """P_ij = n_i . a_j as a [R, N] VPU broadcast (exact f32 products)."""
    p = jnp.zeros((nr.shape[0], n), dtype=jnp.float32)
    for c in range(3):
        p = p + nr[:, c : c + 1] * xat[c : c + 1, :]
    return p


def _kappa_fwd_kernel(
    k, n, rows_ref, nrm_ref, allt_ref,
    kap_ref, m0_ref, i0_ref, tk_ref, ik_ref,
):
    xr = rows_ref[0]  # [R, 3]
    nr = nrm_ref[0]  # [R, 3]
    xat = allt_ref[0]  # [3, N]
    r = xr.shape[0]

    d0 = _exact_sqdist(xr, xat, n)
    p = _proj(nr, xat, n)
    mii = jnp.sum(nr * xr, axis=-1, keepdims=True)  # [R, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)

    # k+1 min picks (first = the self column the reference drops,
    # loss_utils.py:83 via ops.knn semantics); first-index tie break =
    # lax.top_k's stable order.  Same min/where formulation as
    # knn_kernel.py — measured 2x faster than jnp.argmin on v5e.
    d = d0
    i0 = None
    it = None
    for t in range(k + 1):
        m = jnp.min(d, axis=1, keepdims=True)  # [R, 1]
        it = jnp.min(jnp.where(d == m, col, n), axis=1, keepdims=True)
        if t == 0:
            i0 = it
        d = jnp.where(col == it, jnp.inf, d)

    # picked set = entries masked to inf; drop the self pick
    sel = jnp.isinf(d) & (col != i0)
    rn = jnp.sqrt(jnp.maximum(d0, 0.0))
    rr = rn + _EPS
    num = p - mii
    contrib = jnp.where(sel & (d0 > 0), jnp.abs(num) / rr, 0.0)
    kap_ref[0] = jnp.sum(contrib, axis=1, keepdims=True) / k  # [R, 1]

    # lexicographic boundary residuals for the backward's mask rebuild:
    # d0 value at the first and last picks
    m0_ref[0] = jnp.sum(jnp.where(col == i0, d0, 0.0), axis=1, keepdims=True)
    i0_ref[0] = i0
    tk_ref[0] = jnp.sum(jnp.where(col == it, d0, 0.0), axis=1, keepdims=True)
    ik_ref[0] = it


# Forward pick-loop variant (round-5 verdict task 4): v2 applies the
# backward's threshold reconstruction to the FORWARD — a value-
# extraction loop (3 VPU passes/pick vs v1's ~6) plus a cumsum-rank
# boundary rebuild.  Outputs are BITWISE identical
# (tests/test_pallas_kappa.py::test_pick_v1_v2_bitwise), but v2
# measured NEGATIVE on v5e (scripts/bench_kappa_pick_ab.py: kernel
# 575 vs 556 us/call at [8, 1024] k=16; geoa3 1.565 vs 1.593
# clouds/s): Mosaic has no cumsum lowering, so the boundary rank is a
# 10-step pltpu.roll Hillis–Steele scan (scan_util.py) whose ~30
# dependent [R, N] passes eat the ~50 saved by the cheaper picks.
# v1 stays the default; v2 is kept as the A/B arm (PCA_KAPPA_PICK=v2).
_PICK = os.environ.get("PCA_KAPPA_PICK", "v1")


def _kappa_fwd_kernel_v2(
    k, n, rows_ref, nrm_ref, allt_ref,
    kap_ref, m0_ref, i0_ref, tk_ref, ik_ref,
):
    """Value-extraction pick loop + boundary reconstruction.

    The v1 loop spends ~6 VPU passes per pick extracting each pick's
    COLUMN (min, d==m compare, where(col, n), second min, col==it
    compare, mask write).  But the forward only needs the selection
    MASK and the 4 boundary residuals (m0, i0, T, iK) the backward
    already reconstructs the mask from — so v2 extracts distinct
    VALUES only (3 passes per pick: min, compare, mask write) with a
    cumulative multiplicity count to find the boundary value T, then
    rebuilds the boundary COLUMN iK with one lane-cumsum rank pick,
    and the selection mask as the lex-interval test the backward uses.
    ~68N vs ~102N VPU element-ops at k=16, and a shorter dependency
    chain per pass.  Ties at the boundary value (the reference's
    lax.top_k stable order, smallest columns first) stay exact via the
    cumsum rank.
    """
    xr = rows_ref[0]  # [R, 3]
    nr = nrm_ref[0]  # [R, 3]
    xat = allt_ref[0]  # [3, N]
    r = xr.shape[0]

    d0 = _exact_sqdist(xr, xat, n)
    p = _proj(nr, xat, n)
    mii = jnp.sum(nr * xr, axis=-1, keepdims=True)  # [R, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)

    kk = jnp.float32(k + 1)
    d = d0
    cnt = jnp.zeros((r, 1), jnp.float32)
    tval = jnp.zeros((r, 1), jnp.float32)
    cb = jnp.zeros((r, 1), jnp.float32)
    for _ in range(k + 1):
        m = jnp.min(d, axis=1, keepdims=True)  # [R, 1]
        tie = d == m
        c = jnp.sum(tie.astype(jnp.float32), axis=1, keepdims=True)
        crossing = (cnt < kk) & (cnt + c >= kk)
        tval = jnp.where(crossing, m, tval)
        cb = jnp.where(crossing, cnt, cb)
        cnt = cnt + c
        d = jnp.where(tie, jnp.inf, d)

    # boundary column: the (k+1-cb)-th smallest column among the ties
    # at T (exact counts: n <= 4096 << 2^24 in f32).  Running count via
    # the roll-scan — Mosaic has no cumsum lowering (scan_util.py).
    from pointcloudattack_tpu.ops.pallas.scan_util import lane_cumsum

    rq = kk - cb  # [R, 1] in [1, k+1]
    tie_t = d0 == tval
    cs = lane_cumsum(tie_t.astype(jnp.float32))
    ik = jnp.min(
        jnp.where(tie_t & (cs == rq), col, n), axis=1, keepdims=True
    )

    # first pick (the reference's excluded self column): value is the
    # row minimum (exactly 0 at the self column), column is lex-first
    m0 = jnp.min(d0, axis=1, keepdims=True)
    i0 = jnp.min(jnp.where(d0 == m0, col, n), axis=1, keepdims=True)

    sel = (d0 < tval) | (tie_t & (col <= ik))
    rn = jnp.sqrt(jnp.maximum(d0, 0.0))
    rr = rn + _EPS
    num = p - mii
    contrib = jnp.where(sel & (d0 > 0), jnp.abs(num) / rr, 0.0)
    kap_ref[0] = jnp.sum(contrib, axis=1, keepdims=True) / k  # [R, 1]

    m0_ref[0] = m0
    i0_ref[0] = i0
    tk_ref[0] = tval
    ik_ref[0] = ik


def _kappa_bwd_kernel(
    k, n, rows_ref, nrm_ref, allt_ref, nrmt_ref, rowst_ref,
    dk_ref, m0_ref, i0_ref, tk_ref, ik_ref,
    nbr_ref, ctr_ref, dnrm_ref,
):
    j = pl.program_id(1)
    xr = rows_ref[0]  # [R, 3]
    nr = nrm_ref[0]  # [R, 3]
    xat = allt_ref[0]  # [3, N]
    nrt = nrmt_ref[0]  # [3, R] (this row block, pre-transposed)
    xrt = rowst_ref[0]  # [3, R]
    r = xr.shape[0]

    d0 = _exact_sqdist(xr, xat, n)
    p = _proj(nr, xat, n)
    mii = jnp.sum(nr * xr, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)

    m0 = m0_ref[0]  # [R, 1]
    i0 = i0_ref[0]
    tk = tk_ref[0]
    ik = ik_ref[0]
    # picked set = ((d, col) <=lex (T, iK)) minus ((d, col) <=lex (m0, i0))
    le_hi = (d0 < tk) | ((d0 == tk) & (col <= ik))
    le_lo = (d0 < m0) | ((d0 == m0) & (col <= i0))
    sel = le_hi & jnp.logical_not(le_lo)
    _bwd_scatter_core(
        k, j, xr, nr, xat, nrt, xrt, dk_ref[0], sel, d0, p, mii,
        nbr_ref, ctr_ref, dnrm_ref,
    )


def _bwd_scatter_core(
    k, j, xr, nr, xat, nrt, xrt, dk, sel, d0, p, mii,
    nbr_ref, ctr_ref, dnrm_ref,
):
    """Shared backward body once the selection mask ``sel`` is known
    (both the in-kernel-kNN and the cached-index variants end here)."""
    rn = jnp.sqrt(jnp.maximum(d0, 0.0))
    rr = rn + _EPS
    num = p - mii
    s = jnp.sign(num)
    w = dk / k  # [R, 1]
    guard = sel & (d0 > 0)
    # d|u.n|/dv = s*(n/rr - (p/rr)(v/rn)) with v = a_j - a_i, rr=|v|+eps:
    # alpha scales n_i, beta scales v
    ws = w * s
    alpha = jnp.where(guard, ws / rr, 0.0)  # [R, N]
    beta = jnp.where(guard, -(ws * num) / (rr * rr * rn), 0.0)

    # neighbour-side scatter, [3, N]: dadv[j] += alpha_ij n_i + beta_ij a_j
    #   - beta_ij a_i, summed over i by thin MXU matmuls (contraction R,
    # output lanes N — no 3->128 pad on the hot dim)
    hi = jax.lax.Precision.HIGHEST
    n_side = jax.lax.dot_general(
        nrt, alpha, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )  # [3, N]
    x_side = jax.lax.dot_general(
        xrt, beta, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )
    colb = jnp.sum(beta, axis=0, keepdims=True)  # [1, N]
    nbr = n_side + colb * xat - x_side  # [3, N]

    @pl.when(j == 0)
    def _():
        nbr_ref[...] = jnp.zeros_like(nbr_ref)

    nbr_ref[0] += nbr

    # centre side, [R, 3]: dadv[i] -= rowsum(alpha) n_i + (beta @ a)_i
    #   - rowsum(beta) a_i   (row reductions — VPU broadcasts beat a
    # 3-lane-padded MXU matmul here)
    rowa = jnp.sum(alpha, axis=1, keepdims=True)  # [R, 1]
    rowb = jnp.sum(beta, axis=1, keepdims=True)
    bxa = [
        jnp.sum(beta * xat[c : c + 1, :], axis=1, keepdims=True)
        for c in range(3)
    ]  # 3 x [R, 1]
    axa = [
        jnp.sum(alpha * xat[c : c + 1, :], axis=1, keepdims=True)
        for c in range(3)
    ]
    ctr_ref[0] = rowa * nr + jnp.concatenate(bxa, axis=1) - rowb * xr
    # dnormal_i = sum_j alpha_ij (a_j - a_i)  (alpha = w s / rr = w s u / v
    # ... i.e. w*s*unit offsets)
    dnrm_ref[0] = jnp.concatenate(axa, axis=1) - rowa * xr


def _row_block(n: int) -> int:
    if n <= 1024:
        return 256 if n % 256 == 0 else 0
    if n <= 2048:
        return 128 if n % 128 == 0 else 0
    return 0


@functools.partial(jax.jit, static_argnames=("k", "interpret", "pick"))
def _kappa_fwd(adv, normal, k: int, interpret: bool = False, pick: str = ""):
    b, n, _ = adv.shape
    r = _row_block(n)
    adv = adv.astype(jnp.float32)
    normal = normal.astype(jnp.float32)
    advt = jnp.swapaxes(adv, 1, 2)  # [B, 3, N]
    grid = (b, n // r)
    fwd_kernel = (
        _kappa_fwd_kernel
        if (pick or _PICK) == "v1"
        else _kappa_fwd_kernel_v2
    )
    outs = pl.pallas_call(
        functools.partial(fwd_kernel, k, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),  # kappa
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),  # m0
            jax.ShapeDtypeStruct((b, n, 1), jnp.int32),  # i0
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),  # T
            jax.ShapeDtypeStruct((b, n, 1), jnp.int32),  # iK
        ],
        interpret=interpret,
    )(adv, normal, advt)
    kap, m0, i0, tk, ik = outs
    return kap[..., 0], m0, i0, tk, ik


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _kappa_bwd(adv, normal, m0, i0, tk, ik, dkap, k: int, interpret: bool):
    b, n, _ = adv.shape
    r = _row_block(n)
    adv = adv.astype(jnp.float32)
    normal = normal.astype(jnp.float32)
    advt = jnp.swapaxes(adv, 1, 2)
    nrmt = jnp.swapaxes(normal, 1, 2)
    grid = (b, n // r)
    nbr, ctr, dnrm = pl.pallas_call(
        functools.partial(_kappa_bwd_kernel, k, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # rows
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # normals
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0)),  # advT full
            pl.BlockSpec((1, 3, r), lambda i, j: (i, 0, j)),  # normalT blk
            pl.BlockSpec((1, 3, r), lambda i, j: (i, 0, j)),  # advT blk
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),  # dkappa
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),  # m0
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),  # i0
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),  # T
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),  # iK
        ],
        out_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0)),  # nbr (acc)
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # centre
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # dnormal
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
        ],
        interpret=interpret,
    )(adv, normal, advt, nrmt, advt, dkap, m0, i0, tk, ik)
    dadv = jnp.swapaxes(nbr, 1, 2) - ctr
    return dadv, dnrm


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def kappa_knn_mean(adv, normal, k: int, interpret: bool = False):
    """Fused kappa_i = mean_k |unit(a_nbr - a_i) . n_i| over the k
    nearest neighbours of each point (self excluded), [B, N].

    Drop-in for the losses.geometry.kappa_adv/kappa_ori inner
    computation (reference loss_utils.py:60-90) when
    :func:`use_kappa_kernel` admits the shape. ``normal`` receives its
    true cotangent (zero-flow in GeoA3, where normals come from
    stop-gradient lookups, but correct for generic callers).
    """
    kap, *_ = _kappa_fwd(adv, normal, k, interpret)
    return kap


def _kappa_fwd_rule(adv, normal, k, interpret):
    kap, m0, i0, tk, ik = _kappa_fwd(adv, normal, k, interpret)
    return kap, (adv, normal, m0, i0, tk, ik)


def _kappa_bwd_rule(k, interpret, res, dkap):
    adv, normal, m0, i0, tk, ik = res
    dadv, dnrm = _kappa_bwd(
        adv, normal, m0, i0, tk, ik, dkap[..., None], k, interpret
    )
    return dadv.astype(adv.dtype), dnrm.astype(normal.dtype)


kappa_knn_mean.defvjp(_kappa_fwd_rule, _kappa_bwd_rule)


# ---------------------------------------------------------------------
# kappa from CACHED neighbour indices (GeoA3 ``curv_knn_refresh`` > 1).
#
# Same bilinear forward as the selection kernel, but the picked set is
# rebuilt from a given [B, N, K] index array: K compare/or passes over
# the [R, N] block instead of the (k+1)-pick sequential argmin loop
# (~4x fewer dependent VPU passes — the documented bound of the GeoA3
# iteration, BENCH.md anatomy).  Semantics twin: the gather composition
# in losses/geometry.py::kappa_adv's ``self_idx`` path (reference
# loss_utils.py:72-90 with loss_utils.py:83's kNN held fixed between
# refreshes).  Exact-duplicate neighbours contribute the limit value 0
# in forward AND backward (the gather path's 0/eps forward, NaN grad).
# ---------------------------------------------------------------------


def _idx_sel(ix, col, k):
    """[R, N] membership mask of the k given columns (distinct by
    construction — kNN index sets)."""
    sel = col == ix[:, 0:1]
    for t in range(1, k):
        sel = sel | (col == ix[:, t : t + 1])
    return sel


def _kappa_idx_fwd_kernel(k, n, rows_ref, nrm_ref, allt_ref, idx_ref, kap_ref):
    xr = rows_ref[0]  # [R, 3]
    nr = nrm_ref[0]  # [R, 3]
    xat = allt_ref[0]  # [3, N]
    ix = idx_ref[0]  # [R, K] int32
    r = xr.shape[0]

    d0 = _exact_sqdist(xr, xat, n)
    p = _proj(nr, xat, n)
    mii = jnp.sum(nr * xr, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    sel = _idx_sel(ix, col, k)

    rn = jnp.sqrt(jnp.maximum(d0, 0.0))
    rr = rn + _EPS
    num = p - mii
    contrib = jnp.where(sel & (d0 > 0), jnp.abs(num) / rr, 0.0)
    kap_ref[0] = jnp.sum(contrib, axis=1, keepdims=True) / k


def _kappa_idx_bwd_kernel(
    k, n, rows_ref, nrm_ref, allt_ref, nrmt_ref, rowst_ref,
    dk_ref, idx_ref, nbr_ref, ctr_ref, dnrm_ref,
):
    j = pl.program_id(1)
    xr = rows_ref[0]
    nr = nrm_ref[0]
    xat = allt_ref[0]
    nrt = nrmt_ref[0]
    xrt = rowst_ref[0]
    r = xr.shape[0]

    d0 = _exact_sqdist(xr, xat, n)
    p = _proj(nr, xat, n)
    mii = jnp.sum(nr * xr, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    sel = _idx_sel(idx_ref[0], col, k)
    _bwd_scatter_core(
        k, j, xr, nr, xat, nrt, xrt, dk_ref[0], sel, d0, p, mii,
        nbr_ref, ctr_ref, dnrm_ref,
    )


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _kappa_idx_fwd(adv, normal, idx, k: int, interpret: bool = False):
    if idx.shape[-1] != k:
        raise ValueError(
            f"idx has {idx.shape[-1]} neighbour columns but k={k}; "
            "kappa_knn_mean_from_idx uses exactly k columns"
        )
    b, n, _ = adv.shape
    r = _row_block(n)
    adv = adv.astype(jnp.float32)
    normal = normal.astype(jnp.float32)
    advt = jnp.swapaxes(adv, 1, 2)
    grid = (b, n // r)
    kap = pl.pallas_call(
        functools.partial(_kappa_idx_fwd_kernel, k, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, r, k), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        interpret=interpret,
    )(adv, normal, advt, idx.astype(jnp.int32))
    return kap[..., 0]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _kappa_idx_bwd(adv, normal, idx, dkap, k: int, interpret: bool):
    b, n, _ = adv.shape
    r = _row_block(n)
    adv = adv.astype(jnp.float32)
    normal = normal.astype(jnp.float32)
    advt = jnp.swapaxes(adv, 1, 2)
    nrmt = jnp.swapaxes(normal, 1, 2)
    grid = (b, n // r)
    nbr, ctr, dnrm = pl.pallas_call(
        functools.partial(_kappa_idx_bwd_kernel, k, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # rows
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # normals
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0)),  # advT full
            pl.BlockSpec((1, 3, r), lambda i, j: (i, 0, j)),  # normalT blk
            pl.BlockSpec((1, 3, r), lambda i, j: (i, 0, j)),  # advT blk
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0)),  # dkappa
            pl.BlockSpec((1, r, k), lambda i, j: (i, j, 0)),  # idx
        ],
        out_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0)),  # nbr (acc)
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # centre
            pl.BlockSpec((1, r, 3), lambda i, j: (i, j, 0)),  # dnormal
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
        ],
        interpret=interpret,
    )(adv, normal, advt, nrmt, advt, dkap, idx.astype(jnp.int32))
    dadv = jnp.swapaxes(nbr, 1, 2) - ctr
    return dadv, dnrm


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def kappa_knn_mean_from_idx(adv, normal, idx, k: int, interpret: bool = False):
    """kappa_i = mean over the GIVEN k neighbour columns of
    |unit(a_j - a_i) . n_i|, [B, N] — the cached-index twin of
    :func:`kappa_knn_mean` (GeoA3 ``curv_knn_refresh`` loops refresh
    ``idx`` every R iterations; indices carry no tangent).

    Precondition: ``idx.shape[-1] == k`` (enforced) and the k indices
    in each row are DISTINCT — the kernel rebuilds the picked set as a
    column-membership mask (:func:`_idx_sel`), so a duplicated index
    value contributes once, not per-slot like the gather twin.  kNN
    index sets satisfy this by construction."""
    return _kappa_idx_fwd(adv, normal, idx, k, interpret)


def _kappa_idx_fwd_rule(adv, normal, idx, k, interpret):
    kap = _kappa_idx_fwd(adv, normal, idx, k, interpret)
    return kap, (adv, normal, idx)


def _kappa_idx_bwd_rule(k, interpret, res, dkap):
    adv, normal, idx = res
    dadv, dnrm = _kappa_idx_bwd(
        adv, normal, idx, dkap[..., None], k, interpret
    )
    return dadv.astype(adv.dtype), dnrm.astype(normal.dtype), None


kappa_knn_mean_from_idx.defvjp(_kappa_idx_fwd_rule, _kappa_idx_bwd_rule)


def reference_kappa_xla(adv, normal, k: int):
    """Exact-distance XLA twin of the kernel (same math, jnp ops): the
    interpret-mode parity oracle for tests."""
    diff = adv[:, :, None, :] - adv[:, None, :, :]  # [B, N, N, 3]
    d = jnp.sum(diff * diff, axis=-1)
    _, idx = jax.lax.top_k(-d, k + 1)  # [B, N, k+1], stable ties
    idx = idx[..., 1:]
    from pointcloudattack_tpu.ops.gather import index_points

    vec = index_points(adv, idx) - adv[:, :, None, :]
    vec = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + _EPS)
    return jnp.mean(
        jnp.abs(jnp.sum(vec * normal[:, :, None, :], axis=-1)), axis=-1
    )


def use_kappa_kernel(n: int, k: int) -> bool:
    """Kernel admission: TPU Mosaic context + supported geometry."""
    import os

    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels

    flag = os.environ.get("PCA_FUSED_KAPPA", "")
    if flag == "0":
        return False
    if not _HAVE_PLTPU or _row_block(n) == 0 or k < 1 or k + 1 >= n:
        return False
    return use_mosaic_kernels()
