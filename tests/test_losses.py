"""Loss/constraint tests against numpy oracles and torch-formula parity."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu import losses
from pointcloudattack_tpu import constraints

RNG = np.random.RandomState(7)


def pair(b=2, n=32):
    adv = RNG.randn(b, n, 3).astype(np.float32)
    ori = adv + 0.05 * RNG.randn(b, n, 3).astype(np.float32)
    return jnp.asarray(adv), jnp.asarray(ori), adv, ori


class TestAdvLosses:
    def setup_method(self, _):
        self.logits = jnp.asarray(RNG.randn(4, 10).astype(np.float32))
        self.targets = jnp.asarray(np.array([1, 3, 5, 9]))

    def test_targeted_margin(self):
        out = np.asarray(
            losses.logits_adv_loss(self.logits, self.targets, kappa=2.0)
        )
        lg = np.asarray(self.logits)
        for i, t in enumerate([1, 3, 5, 9]):
            other = np.max(np.delete(lg[i], t))
            expect = max(other - lg[i, t] + 2.0, 0.0)
            np.testing.assert_allclose(out[i], expect, rtol=1e-5)

    def test_untargeted_margin(self):
        out = np.asarray(
            losses.untargeted_logits_adv_loss(self.logits, self.targets, 1.0)
        )
        lg = np.asarray(self.logits)
        for i, t in enumerate([1, 3, 5, 9]):
            other = np.max(np.delete(lg[i], t))
            expect = max(lg[i, t] - other + 1.0, 0.0)
            np.testing.assert_allclose(out[i], expect, rtol=1e-5)

    def test_cross_entropy_is_nll(self):
        log_probs = jax.nn.log_softmax(self.logits, axis=-1)
        out = np.asarray(
            losses.cross_entropy_adv_loss(log_probs, self.targets)
        )
        lp = np.asarray(log_probs)
        expect = -lp[np.arange(4), [1, 3, 5, 9]]
        np.testing.assert_allclose(out, expect, rtol=1e-5)


class TestDistances:
    def test_l2(self):
        adv, ori, a, o = pair()
        out = np.asarray(losses.l2_dist(adv, ori))
        expect = np.sqrt(np.sum((a - o) ** 2, axis=(1, 2)))
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_chamfer_oracle(self):
        adv, ori, a, o = pair()
        a2o, o2a = losses.chamfer_both(adv, ori)
        d = np.sum((a[:, :, None] - o[:, None]) ** 2, axis=-1)
        np.testing.assert_allclose(
            np.asarray(a2o), d.min(axis=2).mean(axis=1), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o2a), d.min(axis=1).mean(axis=1), atol=1e-5
        )

    def test_hausdorff_oracle(self):
        adv, ori, a, o = pair()
        a2o, o2a = losses.hausdorff_both(adv, ori)
        d = np.sum((a[:, :, None] - o[:, None]) ** 2, axis=-1)
        np.testing.assert_allclose(
            np.asarray(a2o), d.min(axis=2).max(axis=1), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o2a), d.min(axis=1).max(axis=1), atol=1e-5
        )

    def test_chamfer_hausdorff_nn_bundle(self):
        """Fused bundle == separate chamfer/hausdorff/argmin, incl. grads."""
        adv, ori, a, o = pair()
        a2o, o2a, hd, nn_idx = losses.chamfer_hausdorff_nn(adv, ori)
        ca2o, co2a = losses.chamfer_both(adv, ori)
        np.testing.assert_allclose(np.asarray(a2o), np.asarray(ca2o), atol=1e-6)
        np.testing.assert_allclose(np.asarray(o2a), np.asarray(co2a), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(hd),
            np.asarray(losses.hausdorff_dist(adv, ori)),
            atol=1e-6,
        )
        d = np.sum((a[:, :, None] - o[:, None]) ** 2, axis=-1)
        np.testing.assert_array_equal(np.asarray(nn_idx), d.argmin(axis=2))

        def fused(x):
            f_a2o, f_o2a, f_hd, _ = losses.chamfer_hausdorff_nn(x, ori)
            return jnp.sum(f_a2o + f_o2a + 0.1 * f_hd)

        def separate(x):
            s_a2o, s_o2a = losses.chamfer_both(x, ori)
            return jnp.sum(
                s_a2o + s_o2a + 0.1 * losses.hausdorff_dist(x, ori)
            )

        np.testing.assert_allclose(
            np.asarray(jax.grad(fused)(adv)),
            np.asarray(jax.grad(separate)(adv)),
            atol=1e-6,
        )

    def test_chamfer_hausdorff_nn_kernel_branch(self, monkeypatch):
        """Both dispatch branches of the bundle agree (values + grads).

        On CPU the kernel branch falls back to the XLA row-min path of
        ops/pallas/chamfer_kernel.py — still a different program than
        the inline dense matrix, so this pins the branch equivalence
        the TPU dispatch relies on.
        """
        from pointcloudattack_tpu.losses import distance as dist_mod

        adv, ori, _, _ = pair(b=2, n=40)

        def bundle_sum(x):
            a2o, o2a, hd, _ = dist_mod.chamfer_hausdorff_nn(x, ori)
            return jnp.sum(a2o + o2a + 0.1 * hd)

        v_dense = np.asarray(bundle_sum(adv))
        g_dense = np.asarray(jax.grad(bundle_sum)(adv))
        idx_dense = np.asarray(dist_mod.chamfer_hausdorff_nn(adv, ori)[3])

        monkeypatch.setattr(dist_mod, "_BUNDLE_KERNEL_THRESHOLD", 1)
        v_kern = np.asarray(bundle_sum(adv))
        g_kern = np.asarray(jax.grad(bundle_sum)(adv))
        idx_kern = np.asarray(dist_mod.chamfer_hausdorff_nn(adv, ori)[3])

        np.testing.assert_allclose(v_kern, v_dense, rtol=1e-6)
        np.testing.assert_allclose(g_kern, g_dense, atol=1e-6)
        np.testing.assert_array_equal(idx_kern, idx_dense)

    def test_min_rows_kernel_branch(self, monkeypatch):
        """chamfer/hausdorff dispatch branches agree (values + grads)."""
        from pointcloudattack_tpu.losses import distance as dist_mod

        adv, ori, _, _ = pair(b=2, n=40)

        def loss(x):
            a2o, o2a = dist_mod.chamfer_both(x, ori)
            return jnp.sum(a2o + o2a + dist_mod.hausdorff_dist(x, ori))

        v_dense = np.asarray(loss(adv))
        g_dense = np.asarray(jax.grad(loss)(adv))
        monkeypatch.setattr(dist_mod, "_FUSED_KERNEL_THRESHOLD", 1)
        np.testing.assert_allclose(np.asarray(loss(adv)), v_dense, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.grad(loss)(adv)), g_dense, atol=1e-6
        )

    def test_knn_outlier_oracle(self):
        a = RNG.randn(2, 48, 3).astype(np.float32)
        k, alpha = 5, 1.05
        out = np.asarray(losses.knn_outlier_dist(jnp.asarray(a), k=k, alpha=alpha))
        d = np.sum((a[:, :, None] - a[:, None]) ** 2, axis=-1)
        srt = np.sort(d, axis=-1)[..., 1 : k + 1]  # drop self
        value = srt.mean(axis=-1)  # [B, N]
        thr = value.mean(axis=-1) + alpha * value.std(axis=-1, ddof=1)
        mask = value > thr[:, None]
        expect = (value * mask).mean(axis=-1)
        np.testing.assert_allclose(out, expect, rtol=1e-4)

    def test_knn_outlier_flags_outlier(self):
        a, _, _, _ = pair(n=64)
        a = np.array(a)  # writable copy
        a[0, 0] = 100.0  # blatant outlier
        out = np.asarray(losses.knn_outlier_dist(jnp.asarray(a), k=5))
        assert out[0] > 0.0

    def test_farthest_cluster(self):
        cl = RNG.randn(2, 3, 8, 3).astype(np.float32)
        out = np.asarray(losses.farthest_cluster_dist(jnp.asarray(cl)))
        delta = cl[:, :, None, :, :] - cl[:, :, :, None, :] + 1e-7
        norm = np.sqrt((delta**2).sum(-1))
        expect = norm.max(axis=(2, 3)).sum(axis=1)
        np.testing.assert_allclose(out, expect, rtol=1e-4)


class TestGeometryLosses:
    def test_curvature_zero_for_identical(self):
        adv, ori, _, _ = pair()
        normal = jnp.asarray(RNG.randn(2, 32, 3).astype(np.float32))
        k_ori = losses.kappa_ori(ori, normal, k=2)
        k_adv, _ = losses.kappa_adv(ori, ori, normal, k=2)
        out = np.asarray(losses.curvature_loss(ori, ori, k_adv, k_ori))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_displacement_zero_for_rigid_shift(self):
        adv, ori, a, o = pair()
        shifted = ori + jnp.asarray(np.float32([0.3, -0.2, 0.1]))
        out = np.asarray(losses.displacement_loss(shifted, ori, k=8))
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_grad_flows_through_all(self):
        adv, ori, _, _ = pair()
        normal = jnp.asarray(RNG.randn(2, 32, 3).astype(np.float32))

        def total(a):
            k_ori = losses.kappa_ori(ori, normal)
            k_adv, _ = losses.kappa_adv(a, ori, normal)
            return (
                jnp.sum(losses.chamfer_dist(a, ori))
                + jnp.sum(losses.hausdorff_dist(a, ori))
                + jnp.sum(losses.curvature_loss(a, ori, k_adv, k_ori))
                + jnp.sum(losses.displacement_loss(a, ori))  # [B, N] map
                + jnp.sum(losses.knn_smoothing_loss(a))
            )

        g = jax.grad(total)(adv)
        assert np.all(np.isfinite(np.asarray(g)))


class TestClips:
    def test_linf_budget_respected(self):
        adv, ori, _, _ = pair()
        big = ori + 10.0 * (adv - ori)
        out = constraints.clip_points_linf(big, ori, budget=0.1)
        norms = np.sqrt(
            np.sum((np.asarray(out) - np.asarray(ori)) ** 2, axis=-1)
        )
        assert np.all(norms <= 0.1 + 1e-5)

    def test_linf_noop_inside_budget(self):
        adv, ori, _, _ = pair()
        small = ori + 1e-4 * (adv - ori)
        out = constraints.clip_points_linf(small, ori, budget=1.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(small), atol=1e-6
        )

    def test_l2_budget_respected(self):
        adv, ori, _, _ = pair()
        big = ori + 50.0 * (adv - ori)
        out = constraints.clip_points_l2(big, ori, budget=0.5)
        total = np.sqrt(
            np.sum((np.asarray(out) - np.asarray(ori)) ** 2, axis=(1, 2))
        )
        assert np.all(total <= 0.5 + 1e-4)

    def test_project_inner_keeps_outward(self):
        ori = jnp.asarray(RNG.randn(1, 16, 3).astype(np.float32))
        normal = jnp.asarray(
            np.tile(np.float32([0, 0, 1]), (1, 16, 1))
        )
        outward = ori + jnp.asarray(
            np.tile(np.float32([0, 0, 0.1]), (1, 16, 1))
        )
        out = constraints.project_inner_points(outward, ori, normal)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(outward), atol=1e-6
        )

    def test_project_inner_zeros_antiparallel(self):
        ori = jnp.asarray(RNG.randn(1, 16, 3).astype(np.float32))
        normal = jnp.asarray(np.tile(np.float32([0, 0, 1]), (1, 16, 1)))
        inward = ori + jnp.asarray(
            np.tile(np.float32([0, 0, -0.1]), (1, 16, 1))
        )
        out = constraints.project_inner_points(inward, ori, normal)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ori), atol=1e-6
        )


class TestDisplacementOracle:
    def test_magnitude_semantics(self):
        """Reference compares scalar |d|^2 magnitudes, not vectors:
        equal-magnitude opposite displacements give ZERO loss."""
        rng = np.random.RandomState(3)
        ori = rng.randn(1, 16, 3).astype(np.float32)
        dirs = rng.randn(1, 16, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        adv = ori + 0.1 * dirs  # all |d|^2 equal
        out = np.asarray(
            losses.displacement_loss(jnp.asarray(adv), jnp.asarray(ori), k=4)
        )
        assert out.shape == (1, 16)
        np.testing.assert_allclose(out, 0.0, atol=1e-8)
