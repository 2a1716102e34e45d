"""Pallas chamfer kernel: interpreter-mode parity vs XLA, VJP checks."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.pallas import chamfer_kernel as CK
from pointcloudattack_tpu.losses.distance import chamfer_both

RNG = np.random.RandomState(55)


def test_xla_path_matches_bruteforce():
    x = jnp.asarray(RNG.randn(2, 40, 3).astype(np.float32))
    y = jnp.asarray(RNG.randn(2, 30, 3).astype(np.float32))
    mins, idx = CK._min_rows_xla(x, y)
    d = np.sum(
        (np.asarray(x)[:, :, None] - np.asarray(y)[:, None]) ** 2, -1
    )
    np.testing.assert_allclose(np.asarray(mins), d.min(-1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))


def test_pallas_interpret_matches_xla():
    """Run the kernel in interpreter mode (CPU) against the XLA path."""
    x = jnp.asarray(RNG.randn(700, 3).astype(np.float32))  # non-multiple
    y = jnp.asarray(RNG.randn(1500, 3).astype(np.float32))
    mins_k, idx_k = CK._min_rows_pallas_2d(x, y, interpret=True)
    mins_x, idx_x = CK._min_rows_xla(x, y)
    np.testing.assert_allclose(
        np.asarray(mins_k), np.asarray(mins_x), atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_x))


def test_min_rows_chamfer_matches_reference_impl():
    adv = jnp.asarray(RNG.randn(2, 64, 3).astype(np.float32))
    ori = jnp.asarray(RNG.randn(2, 64, 3).astype(np.float32))
    a2o_f = jnp.mean(CK.min_sqdist_rows(adv, ori)[0], axis=-1)
    o2a_f = jnp.mean(CK.min_sqdist_rows(ori, adv)[0], axis=-1)
    a2o, o2a = chamfer_both(adv, ori)
    np.testing.assert_allclose(np.asarray(a2o_f), np.asarray(a2o), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o2a_f), np.asarray(o2a), atol=1e-4)


def test_custom_vjp_matches_autodiff():
    adv = jnp.asarray(RNG.randn(1, 32, 3).astype(np.float32))
    ori = jnp.asarray(RNG.randn(1, 40, 3).astype(np.float32))

    def loss_fused(a, o):
        a2o = jnp.mean(CK.min_sqdist_rows(a, o)[0], axis=-1)
        o2a = jnp.mean(CK.min_sqdist_rows(o, a)[0], axis=-1)
        return jnp.sum(a2o + o2a)

    def loss_dense(a, o):
        a2o, o2a = chamfer_both(a, o)
        return jnp.sum(a2o + o2a)

    ga_f, go_f = jax.grad(loss_fused, argnums=(0, 1))(adv, ori)
    ga_d, go_d = jax.grad(loss_dense, argnums=(0, 1))(adv, ori)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(go_f), np.asarray(go_d), atol=1e-4)


def test_fps_kernel_interpret_matches_scan():
    """FPS kernel (interpreter mode) reproduces the scan recurrence."""
    from pointcloudattack_tpu.ops.pallas.fps_kernel import fps_pallas
    from pointcloudattack_tpu.ops.fps import farthest_point_sample

    x = jnp.asarray(RNG.randn(2, 100, 3).astype(np.float32))
    start = jnp.zeros((2,), dtype=jnp.int32)
    got = np.asarray(fps_pallas(x, 16, start, interpret=True))
    want = np.asarray(farthest_point_sample(x, 16, key=None))
    np.testing.assert_array_equal(got, want)


def test_fps_kernel_random_start_interpret():
    from pointcloudattack_tpu.ops.pallas.fps_kernel import fps_pallas

    x = jnp.asarray(RNG.randn(1, 64, 3).astype(np.float32))
    start = jnp.asarray([17], dtype=jnp.int32)
    got = np.asarray(fps_pallas(x, 8, start, interpret=True))[0]
    assert got[0] == 17
    assert len(set(got.tolist())) == 8


def test_fps_kernel_under_grad(monkeypatch):
    """Differentiating through an FPS-based gather must work when the
    kernel path is active (regression: pallas_call linearization)."""
    import pointcloudattack_tpu.ops.pallas.fps_kernel as FK
    import pointcloudattack_tpu.ops.fps as F

    monkeypatch.setattr(FK, "use_fps_kernel", lambda b, n: True)
    real = FK.fps_pallas
    monkeypatch.setattr(
        FK, "fps_pallas",
        lambda xyz, npoint, start: real(xyz, npoint, start, interpret=True),
    )

    from pointcloudattack_tpu.ops.gather import index_points

    x = jnp.asarray(RNG.randn(2, 64, 3).astype(np.float32))

    def loss(a):
        idx = F.farthest_point_sample(a, 8, key=None)
        return jnp.sum(index_points(a, idx) ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


class TestKnnKernel:
    """Fused distance+top-k kernel vs the XLA knn path."""

    def _xla_knn(self, x, k):
        from pointcloudattack_tpu.ops.pairwise import self_sqdist

        return jax.lax.top_k(-self_sqdist(x), k)[1]

    def test_interpret_matches_xla(self):
        from pointcloudattack_tpu.ops.pallas.knn_kernel import knn_pallas

        rng = np.random.RandomState(0)
        for (b, n, c, k) in [(2, 128, 3, 20), (2, 256, 64, 16),
                             (1, 96, 7, 5)]:
            x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
            want = np.asarray(self._xla_knn(x, k))
            got = np.asarray(knn_pallas(x, k, interpret=True))
            np.testing.assert_array_equal(got, want)

    def test_interpret_indivisible_n(self):
        """N with no power-of-two divisor down to 8 (the reference's
        rand_row faces land on such sizes, readbnt.py:59) must take the
        padded-rows path — never a single [N, N] VMEM block — and
        return the same neighbour SET (order may swap under near-ties,
        see the kernel docstring)."""
        from pointcloudattack_tpu.ops.pallas.knn_kernel import knn_pallas

        rng = np.random.RandomState(2)
        for (b, n, k) in [(2, 100, 8), (1, 1023, 16), (1, 515, 5)]:
            x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
            want = np.sort(np.asarray(self._xla_knn(x, k)), axis=-1)
            got = np.sort(
                np.asarray(knn_pallas(x, k, interpret=True)), axis=-1
            )
            np.testing.assert_array_equal(got, want)

    def test_interpret_tie_breaking(self):
        """Duplicate points: ties must resolve by ascending index like
        lax.top_k's stable sort."""
        from pointcloudattack_tpu.ops.pallas.knn_kernel import knn_pallas

        rng = np.random.RandomState(1)
        x = np.zeros((1, 64, 3), np.float32)
        x[0, :8] = 1.0
        x[0, 8:] = rng.randn(56, 3)
        x = jnp.asarray(x)
        np.testing.assert_array_equal(
            np.asarray(knn_pallas(x, 10, interpret=True)),
            np.asarray(self._xla_knn(x, 10)),
        )

    def test_knn_wrapper_under_grad(self, monkeypatch):
        """When the kernel is selected, gradients through gather(knn(x))
        must still flow (idx is stop-gradiented into the kernel)."""
        import pointcloudattack_tpu.ops.pallas.knn_kernel as KK
        from pointcloudattack_tpu.ops.knn import knn
        from pointcloudattack_tpu.ops.gather import index_points

        orig = KK.knn_pallas
        monkeypatch.setattr(KK, "use_knn_kernel", lambda n, k: True)
        monkeypatch.setattr(
            KK,
            "knn_pallas",
            lambda x, k, **kw: orig(x, k, interpret=True),
        )
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))

        def f(a):
            idx = knn(a, 8)
            return jnp.sum(index_points(a, idx) ** 2)

        g = jax.grad(f)(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestMinSqdistBoth:
    """Fused two-direction bundle kernel (GeoA3 per-iter Chamfer+HD+nn)."""

    def _clouds(self, b=2, n=256, m=128):
        x = jnp.asarray(RNG.randn(b, n, 3).astype(np.float32))
        y = jnp.asarray(RNG.randn(b, m, 3).astype(np.float32))
        return x, y

    def test_interpret_fwd_matches_dense(self, monkeypatch):
        monkeypatch.setattr(CK, "_BOTH_INTERPRET", True)
        x, y = self._clouds()
        rmin, cmin, rarg = CK.min_sqdist_both(x, y)
        d = np.sum(
            (np.asarray(x)[:, :, None] - np.asarray(y)[:, None]) ** 2, -1
        )
        np.testing.assert_allclose(np.asarray(rmin), d.min(-1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cmin), d.min(-2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(rarg), d.argmin(-1))

    def test_interpret_bwd_matches_dense_autodiff(self, monkeypatch):
        x, y = self._clouds(b=1, n=128, m=256)

        def loss(fn):
            def f(a, o):
                rmin, cmin, _ = fn(a, o)
                return (
                    jnp.sum(jnp.mean(rmin, -1) + 0.5 * jnp.mean(cmin, -1))
                    + jnp.sum(jnp.max(rmin, -1))
                )

            return f

        def dense(a, o):
            from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist

            d = pairwise_sqdist(a, o)
            return (
                jnp.min(d, -1),
                jnp.min(d, -2),
                jnp.argmin(d, -1),
            )

        ga_d, go_d = jax.grad(loss(dense), argnums=(0, 1))(x, y)
        monkeypatch.setattr(CK, "_BOTH_INTERPRET", True)
        ga_k, go_k = jax.grad(loss(CK.min_sqdist_both), argnums=(0, 1))(x, y)
        np.testing.assert_allclose(
            np.asarray(ga_k), np.asarray(ga_d), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(go_k), np.asarray(go_d), rtol=1e-4, atol=1e-6
        )

    def test_xla_fallback_custom_vjp_matches_dense_autodiff(self):
        """The non-kernel branch of min_sqdist_both's VJP (gather +
        scatter form) against autodiff of the dense matrix."""
        x, y = self._clouds(b=2, n=60, m=40)

        def via_bundle(a, o):
            rmin, cmin, _ = CK.min_sqdist_both(a, o)
            return jnp.sum(jnp.mean(rmin, -1) + jnp.mean(cmin, -1))

        def via_dense(a, o):
            from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist

            d = pairwise_sqdist(a, o)
            return jnp.sum(jnp.mean(jnp.min(d, -1), -1)
                           + jnp.mean(jnp.min(d, -2), -1))

        ga_b, go_b = jax.grad(via_bundle, argnums=(0, 1))(x, y)
        ga_d, go_d = jax.grad(via_dense, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(
            np.asarray(ga_b), np.asarray(ga_d), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(go_b), np.asarray(go_d), rtol=1e-4, atol=1e-6
        )

    def test_gate(self):
        # CPU: Mosaic gate off regardless of shape
        assert not CK.use_both_kernel(1024, 1024)
        assert not CK.use_both_kernel(1000, 1024)  # non-128-multiple
        assert not CK.use_both_kernel(2048, 1024)  # over VMEM budget
