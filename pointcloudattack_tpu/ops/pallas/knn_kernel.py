"""Pallas TPU kernel: fused pairwise-distance + exact top-k neighbours.

DGCNN rebuilds a feature-space kNN graph before every EdgeConv stage
(reference model/dgcnn.py:194-227); on TPU the XLA lowering pays ~9 ms
per stage for ``lax.top_k`` over the [B, N, N] distance matrix plus the
HBM round-trip of that matrix (BENCH.md).  This kernel keeps a row-block
of the distance matrix VMEM-resident: distances come off the MXU, and
the k smallest entries per row are selected with k masked argmin passes
on the VPU (k=20 << N, so iterative selection beats a sort).  The [N, N]
matrix never touches HBM.

Contract matches ops.knn.knn: indices of the k nearest points, self
included, ties broken by ascending index (the stable-sort order of
``lax.top_k`` on the negated distances).  In interpret mode the indices
are bitwise identical to the XLA path; on TPU hardware the MXU's
contraction order can round near-tied distances differently, which may
swap the ORDER of two neighbours inside the top-k (measured 2 of 655360
indices at [32, 1024, 64]) — the neighbour SET is always identical, and
every consumer (EdgeConv, grouping) max-pools over the set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

# keep x_all + one distance row-block comfortably inside ~16MB VMEM
_MAX_N = 4096


def _knn_kernel(k: int, n: int, rows_ref, all_ref, out_ref):
    """rows [1, R, C], all [1, N, C] -> idx [1, R, k] int32."""
    xr = rows_ref[0]  # [R, C]
    xa = all_ref[0]  # [N, C]
    r = xr.shape[0]

    # same formula and precision as ops.pairwise.self_sqdist: the MXU
    # cross term in full f32, rank-1 norms added on the VPU
    xy = jax.lax.dot_general(
        xr,
        xa,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, N]
    d = (
        jnp.sum(xr * xr, axis=-1, keepdims=True)
        - 2.0 * xy
        + jnp.sum(xa * xa, axis=-1)[None, :]
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    picks = []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)  # [R, 1]
        # first index attaining the minimum (lax.top_k's stable tie
        # order).  This min + where(d==m) + mask-update cycle is the
        # measured-fastest formulation: same-process v5e A/B found
        # jnp.argmin's variadic reduce 2x slower, and a candidate-mask
        # variant that avoided the d rewrite 1.5x slower (the loop is
        # VPU-op-bound, not VMEM-bound) — BENCH.md round-4 ledger.
        idx_t = jnp.min(jnp.where(d == m, col, n), axis=1)  # [R]
        picks.append(idx_t)
        d = jnp.where(col == idx_t[:, None], jnp.inf, d)
    out_ref[0] = jnp.stack(picks, axis=-1)  # [R, k]


@functools.partial(
    jax.jit, static_argnames=("k", "rows_per_block", "interpret")
)
def knn_pallas(
    x: jax.Array,
    k: int,
    rows_per_block: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Exact self-kNN indices: x [B, N, C] -> [B, N, k] int32.

    rows_per_block=0 picks the largest power-of-two divisor of N up to
    512.  The kernel takes no gradient path (indices are integers); the
    caller stop-gradients the input.
    """
    b, n, c = x.shape
    x = x.astype(jnp.float32)
    if rows_per_block == 0:
        rows_per_block = 512
        while rows_per_block > 8 and n % rows_per_block:
            rows_per_block //= 2
    rows = x
    pad = (-n) % rows_per_block
    if pad:
        # Indivisible N (e.g. the reference's rand_row faces at odd
        # sizes): pad the ROW operand only — padded rows compute junk
        # neighbours that are sliced off below; the candidate set stays
        # the true N, so real rows are unaffected.  Never fall back to
        # a single [N, N] block: at N=4095 that is a 67 MB VMEM tile.
        rows_per_block = min(512, -(-n // 8) * 8)
        pad = (-n) % rows_per_block
        rows = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    grid = (b, (n + pad) // rows_per_block)
    out = pl.pallas_call(
        functools.partial(_knn_kernel, k, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_block, c), lambda i, j: (i, j, 0)
            ),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, k), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n + pad, k), jnp.int32),
        interpret=interpret,
    )(rows, x)
    return out[:, :n] if pad else out


def use_knn_kernel(n: int, k: int) -> bool:
    """Kernel is profitable on TPU for the DGCNN-style regimes."""
    from pointcloudattack_tpu.ops.backend import use_mosaic_kernels

    if not _HAVE_PLTPU or n > _MAX_N or k > 64 or k >= n:
        return False
    return use_mosaic_kernels()
