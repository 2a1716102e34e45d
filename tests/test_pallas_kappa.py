"""Fused kappa (self-kNN curvature proxy) kernel vs the XLA path.

Oracles:
  * ``reference_kappa_xla`` — the kernel's exact-distance twin in jnp
    ops (same selection semantics, autodiff backward);
  * ``losses.geometry.kappa_adv`` — the shipped XLA composition
    (expansion-form distances; reference loss_utils.py:72-90 twin).

The kernel runs in interpret mode on CPU (tests/conftest.py pins the
platform); dispatch gating is covered at the bottom.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudattack_tpu.geometry.normals import estimate_normal
from pointcloudattack_tpu.losses import geometry as G
from pointcloudattack_tpu.ops.pallas.kappa_kernel import (
    _kappa_bwd,
    _kappa_fwd,
    kappa_knn_mean,
    reference_kappa_xla,
    use_kappa_kernel,
)


def _cloud(b=2, n=256, seed=0):
    pts = jax.random.normal(jax.random.PRNGKey(seed), (b, n, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    nrm = estimate_normal(pts, k=3)
    return pts, nrm


@pytest.mark.parametrize("k", [4, 16])
def test_fwd_matches_exact_twin(k):
    pts, nrm = _cloud()
    kap, *_ = _kappa_fwd(pts, nrm, k, interpret=True)
    ref = reference_kappa_xla(pts, nrm, k)
    # the kernel's bilinear numerator n.a_j - n.a_i rounds differently
    # from the twin's n.(a_j - a_i): measured max ~5e-4 relative on a
    # couple of near-tangent pairs per 512 points (module docstring)
    np.testing.assert_allclose(
        np.asarray(kap), np.asarray(ref), rtol=2e-3, atol=1e-5
    )


def test_fwd_matches_shipped_kappa_adv():
    """vs the expansion-distance XLA path actually shipped in
    losses.geometry (selection may differ only at f32 near-ties)."""
    pts, nrm = _cloud(seed=3)
    k = 16
    kap, *_ = _kappa_fwd(pts, nrm, k, interpret=True)
    idx = G.self_knn_idx(pts, k)
    vec = G._neighbour_offsets(pts, pts, idx)
    vec = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 1e-12)
    ref = jnp.mean(
        jnp.abs(jnp.sum(vec * nrm[:, :, None, :], axis=-1)), axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(kap), np.asarray(ref), rtol=1e-3, atol=1e-5
    )


@pytest.mark.parametrize("k", [4, 16])
def test_bwd_matches_autodiff_of_twin(k):
    pts, nrm = _cloud(b=2, n=256, seed=1)
    wkey = jax.random.PRNGKey(9)
    w = jax.random.normal(wkey, pts.shape[:2])

    def loss_kernel(a, m):
        return jnp.sum(kappa_knn_mean(a, m, k, True) * w)

    def loss_twin(a, m):
        return jnp.sum(reference_kappa_xla(a, m, k) * w)

    ga, gn = jax.grad(loss_kernel, argnums=(0, 1))(pts, nrm)
    ra, rn = jax.grad(loss_twin, argnums=(0, 1))(pts, nrm)
    for got, ref in ((ga, ra), (gn, rn)):
        got, ref = np.asarray(got).ravel(), np.asarray(ref).ravel()
        cos = np.dot(got, ref) / (
            np.linalg.norm(got) * np.linalg.norm(ref) + 1e-30
        )
        assert cos > 1.0 - 1e-6, cos
        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-5)


def test_bwd_shapes_and_finite_on_duplicates():
    """An exact-duplicate neighbour: XLA emits NaN (0/0 normalize); the
    kernel takes the limit 0 for both value and gradient."""
    pts, nrm = _cloud(b=1, n=256, seed=2)
    pts = pts.at[0, 7].set(pts[0, 3])  # duplicate point
    k = 4
    kap, *_ = _kappa_fwd(pts, nrm, k, interpret=True)
    assert np.all(np.isfinite(np.asarray(kap)))

    g = jax.grad(
        lambda a: jnp.sum(kappa_knn_mean(a, nrm, k, True))
    )(pts)
    assert np.all(np.isfinite(np.asarray(g)))


def test_residual_mask_rebuild_consistency():
    """The backward's lexicographic mask rebuild selects exactly the
    forward's picked neighbour set: zero-cotangent rows must produce
    exactly zero gradient, and single-row cotangents only touch the
    row's neighbourhood."""
    pts, nrm = _cloud(b=1, n=256, seed=4)
    k = 8
    kap, m0, i0, tk, ik = _kappa_fwd(pts, nrm, k, interpret=True)
    dk = jnp.zeros_like(kap)[..., None]
    dadv, dnrm = _kappa_bwd(
        pts, nrm, m0, i0, tk, ik, dk, k, True
    )
    assert float(jnp.abs(dadv).max()) == 0.0
    assert float(jnp.abs(dnrm).max()) == 0.0

    dk = dk.at[0, 5, 0].set(1.0)
    dadv, dnrm = _kappa_bwd(pts, nrm, m0, i0, tk, ik, dk, k, True)
    touched = np.nonzero(np.abs(np.asarray(dadv[0])).sum(-1))[0]
    # exactly row 5 + its k neighbours
    assert 5 in touched and len(touched) <= k + 1
    touched_n = np.nonzero(np.abs(np.asarray(dnrm[0])).sum(-1))[0]
    assert list(touched_n) == [5]


@pytest.mark.parametrize("k", [4, 16])
def test_pick_v1_v2_bitwise(k):
    """The v2 forward (value-extraction loop + threshold/cumsum-rank
    boundary reconstruction, round-5 verdict task 4) is BITWISE equal
    to the v1 index-extraction loop — kappa AND all four backward
    residuals — on generic clouds, on clouds with exact duplicate
    points (multi-column zero-distance ties), and on grid-quantized
    clouds whose squared distances collide at the selection boundary."""
    pts, nrm = _cloud(b=2, n=256, seed=7)

    # exact duplicates of several centres (self-tie columns)
    dup = jnp.asarray(np.asarray(pts))
    dup = dup.at[0, 10].set(dup[0, 3]).at[0, 11].set(dup[0, 3])
    dup = dup.at[1, 200].set(dup[1, 199])

    # coarse grid quantization -> massive distance-value ties
    grid = jnp.round(pts * 2.0) / 2.0

    for cloud in (pts, dup, grid):
        outs1 = _kappa_fwd(cloud, nrm, k, interpret=True, pick="v1")
        outs2 = _kappa_fwd(cloud, nrm, k, interpret=True, pick="v2")
        for a, b in zip(outs1, outs2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gate_respects_backend_and_env(monkeypatch):
    # CPU backend: Mosaic gate is off
    assert not use_kappa_kernel(1024, 16)
    monkeypatch.setenv("PCA_FUSED_KAPPA", "0")
    assert not use_kappa_kernel(1024, 16)
    # unsupported geometry is rejected regardless
    assert not use_kappa_kernel(1000, 16)
    assert not use_kappa_kernel(256, 300)


# ---------------------------------------------------------------------
# cached-index variant (kappa_knn_mean_from_idx)
# ---------------------------------------------------------------------


def _gather_kappa(pts, nrm, idx):
    """The shipped gather-composition twin of the cached-index kernel
    (losses.geometry.kappa_adv self_idx path, reference
    loss_utils.py:72-90 with the kNN held fixed)."""
    vec = G._neighbour_offsets(pts, pts, idx)
    vec = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 1e-12)
    return jnp.mean(
        jnp.abs(jnp.sum(vec * nrm[:, :, None, :], axis=-1)), axis=-1
    )


@pytest.mark.parametrize("k", [4, 16])
def test_idx_fwd_matches_gather_twin_and_selection_kernel(k):
    from pointcloudattack_tpu.ops.pallas.kappa_kernel import _kappa_idx_fwd

    pts, nrm = _cloud(seed=5)
    idx = G.self_knn_idx(pts, k)
    kap = _kappa_idx_fwd(pts, nrm, idx, k, interpret=True)
    ref = _gather_kappa(pts, nrm, idx)
    np.testing.assert_allclose(
        np.asarray(kap), np.asarray(ref), rtol=2e-3, atol=1e-5
    )
    # fed the self-kNN sets the selection kernel picks itself, the two
    # kernels share the contribution formula exactly
    kap_sel, *_ = _kappa_fwd(pts, nrm, k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(kap), np.asarray(kap_sel), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("k", [4, 16])
def test_idx_bwd_matches_autodiff_of_gather_twin(k):
    from pointcloudattack_tpu.ops.pallas.kappa_kernel import (
        kappa_knn_mean_from_idx,
    )

    pts, nrm = _cloud(b=2, n=256, seed=6)
    idx = G.self_knn_idx(pts, k)
    w = jax.random.normal(jax.random.PRNGKey(11), pts.shape[:2])

    def loss_kernel(a, m):
        return jnp.sum(kappa_knn_mean_from_idx(a, m, idx, k, True) * w)

    def loss_twin(a, m):
        return jnp.sum(_gather_kappa(a, m, idx) * w)

    ga, gn = jax.grad(loss_kernel, argnums=(0, 1))(pts, nrm)
    ra, rn = jax.grad(loss_twin, argnums=(0, 1))(pts, nrm)
    for got, ref in ((ga, ra), (gn, rn)):
        got, ref = np.asarray(got).ravel(), np.asarray(ref).ravel()
        cos = np.dot(got, ref) / (
            np.linalg.norm(got) * np.linalg.norm(ref) + 1e-30
        )
        assert cos > 1.0 - 1e-6, cos
        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-5)


def test_idx_variant_stale_indices_duplicates_finite():
    """Stale cached indices on a moved cloud: a cached neighbour that
    collides exactly with its centre contributes 0 with finite grads."""
    from pointcloudattack_tpu.ops.pallas.kappa_kernel import (
        kappa_knn_mean_from_idx,
    )

    pts, nrm = _cloud(b=1, n=256, seed=7)
    k = 4
    idx = G.self_knn_idx(pts, k)
    moved = pts.at[0, 9].set(pts[0, int(idx[0, 9, 0])])  # collide
    kap = kappa_knn_mean_from_idx(moved, nrm, idx, k, True)
    assert np.all(np.isfinite(np.asarray(kap)))
    g = jax.grad(
        lambda a: jnp.sum(kappa_knn_mean_from_idx(a, nrm, idx, k, True))
    )(moved)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fallback_path_stale_collision_finite():
    """CPU/XLA-fallback twin of the collision test: kappa_adv with a
    cached ``self_idx`` whose neighbour collides exactly with its
    centre must share the kernel's limit-0 semantics — forward 0 for
    that slot and FINITE gradients (losses/geometry.py
    ``_masked_unit_projection`` double-where guard; previously the
    gather path emitted NaN grads through ``norm`` at 0)."""
    pts, nrm = _cloud(b=1, n=64, seed=11)
    k = 4
    idx = G.self_knn_idx(pts, k)
    moved = pts.at[0, 9].set(pts[0, int(idx[0, 9, 0])])  # collide

    def loss(a):
        kap, _ = G.kappa_adv(a, pts, nrm, k=k, self_idx=idx)
        return jnp.sum(kap)

    kap, _ = G.kappa_adv(moved, pts, nrm, k=k, self_idx=idx)
    assert np.all(np.isfinite(np.asarray(kap)))
    g = jax.grad(loss)(moved)
    assert np.all(np.isfinite(np.asarray(g)))
    # kappa_ori fallback shares the guard (duplicate point in the cloud)
    dup = pts.at[0, 5].set(pts[0, 6])
    g2 = jax.grad(lambda a: jnp.sum(G.kappa_ori(a, nrm, k=2)))(dup)
    assert np.all(np.isfinite(np.asarray(g2)))


def test_idx_variant_rejects_k_mismatch():
    """kappa_knn_mean_from_idx uses exactly k columns — a caller
    passing a wider/narrower idx must fail loudly, not silently use a
    prefix (ADVICE r4)."""
    from pointcloudattack_tpu.ops.pallas.kappa_kernel import (
        kappa_knn_mean_from_idx,
    )

    pts, nrm = _cloud(b=1, n=256, seed=7)
    idx = G.self_knn_idx(pts, 6)  # 6 columns
    with pytest.raises(ValueError, match="neighbour columns"):
        kappa_knn_mean_from_idx(pts, nrm, idx, 4, True)
