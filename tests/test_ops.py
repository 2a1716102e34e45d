"""L0 op tests against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudattack_tpu import ops


RNG = np.random.RandomState(0)


def clouds(b=2, n=64, m=48, c=3):
    return (
        RNG.randn(b, n, c).astype(np.float32),
        RNG.randn(b, m, c).astype(np.float32),
    )


class TestPairwise:
    def test_matches_bruteforce(self):
        x, y = clouds()
        d = np.asarray(ops.pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
        brute = np.sum(
            (x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1
        )
        np.testing.assert_allclose(d, brute, atol=1e-4)

    def test_self_diag_near_zero(self):
        x, _ = clouds()
        d = np.asarray(ops.self_sqdist(jnp.asarray(x)))
        diag = d[:, np.arange(64), np.arange(64)]
        np.testing.assert_allclose(diag, 0.0, atol=1e-4)


class TestGather:
    def test_index_points_2d(self):
        x, _ = clouds()
        idx = RNG.randint(0, 64, size=(2, 10))
        out = np.asarray(ops.index_points(jnp.asarray(x), jnp.asarray(idx)))
        expect = np.stack([x[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(out, expect)

    def test_index_points_3d(self):
        x, _ = clouds()
        idx = RNG.randint(0, 64, size=(2, 10, 4))
        out = np.asarray(ops.index_points(jnp.asarray(x), jnp.asarray(idx)))
        expect = np.stack([x[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(out, expect)

    def test_index_points_mm_bwd_matches(self):
        """Scatter-free-backward gather: fwd bitwise, grads vs scatter.

        Duplicate indices (randint WILL repeat over 64 with 40 draws)
        exercise the summed-cotangent path the one-hot matmul replaces.
        """
        x, _ = clouds()
        xj = jnp.asarray(x)
        for shape in [(2, 40), (2, 10, 4)]:
            idx = jnp.asarray(RNG.randint(0, 64, size=shape))
            a = ops.index_points(xj, idx)
            b = ops.index_points_mm_bwd(xj, idx)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

            def f_ref(p, i=idx):
                return jnp.sum(jnp.sin(ops.index_points(p, i)) ** 2)

            def f_mm(p, i=idx):
                return jnp.sum(jnp.sin(ops.index_points_mm_bwd(p, i)) ** 2)

            g_ref = np.asarray(jax.jit(jax.grad(f_ref))(xj))
            g_mm = np.asarray(jax.jit(jax.grad(f_mm))(xj))
            np.testing.assert_allclose(g_mm, g_ref, atol=1e-6)

    def test_index_points_mm_bwd_bf16_cotangent_dtype(self):
        """bf16 inputs must get bf16 cotangents (ADVICE round-2 class)."""
        x, _ = clouds()
        xb = jnp.asarray(x).astype(jnp.bfloat16)
        idx = jnp.asarray(RNG.randint(0, 64, size=(2, 10, 4)))

        def f(p):
            g = ops.index_points_mm_bwd(p, idx).astype(jnp.float32)
            return jnp.sum(g * g)

        grad = jax.grad(f)(xb)
        assert grad.dtype == jnp.bfloat16


class TestKnn:
    def test_self_knn_includes_self(self):
        x, _ = clouds()
        idx = np.asarray(ops.knn(jnp.asarray(x), k=5))
        assert idx.shape == (2, 64, 5)
        np.testing.assert_array_equal(
            idx[..., 0], np.broadcast_to(np.arange(64), (2, 64))
        )

    def test_knn_points_oracle(self):
        x, y = clouds(n=32, m=40)
        d, idx = ops.knn_points(jnp.asarray(x), jnp.asarray(y), k=3)
        d, idx = np.asarray(d), np.asarray(idx)
        brute = np.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1)
        expect_idx = np.argsort(brute, axis=-1)[..., :3]
        expect_d = np.take_along_axis(brute, expect_idx, axis=-1)
        np.testing.assert_allclose(d, expect_d, atol=1e-4)
        np.testing.assert_allclose(
            np.take_along_axis(brute, idx, axis=-1), expect_d, atol=1e-4
        )

    def test_exclude_self(self):
        x, _ = clouds()
        _, idx = ops.knn_points(
            jnp.asarray(x), jnp.asarray(x), k=4, exclude_self=True
        )
        idx = np.asarray(idx)
        assert not np.any(idx == np.arange(64)[None, :, None])


class TestFPS:
    def test_spread_beats_random(self):
        x, _ = clouds(n=256)
        idx = np.asarray(
            ops.farthest_point_sample(jnp.asarray(x), 32, key=None)
        )
        assert idx.shape == (2, 32)
        for b in range(2):
            assert len(set(idx[b].tolist())) == 32  # no duplicates

    def test_oracle_recurrence(self):
        """Exactly reproduce the sequential min-dist/argmax recurrence."""
        x = RNG.randn(1, 40, 3).astype(np.float32)
        got = np.asarray(
            ops.farthest_point_sample(jnp.asarray(x), 8, key=None)
        )[0]
        dist = np.full(40, np.inf)
        far = 0
        expect = []
        for _ in range(8):
            expect.append(far)
            d = np.sum((x[0] - x[0][far]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            far = int(np.argmax(dist))
        np.testing.assert_array_equal(got, np.array(expect))

    def test_random_start(self):
        x, _ = clouds(n=128)
        k1 = jax.random.PRNGKey(1)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(x), 16, key=k1))
        assert idx.shape == (2, 16)


class TestBallQuery:
    def test_oracle_semantics(self):
        """First nsample in-radius points in index order, padded by first."""
        x = RNG.rand(1, 50, 3).astype(np.float32)
        q = x[:, :8]
        radius, nsample = 0.35, 6
        got = np.asarray(ops.query_ball_point(radius, nsample, jnp.asarray(x), jnp.asarray(q)))
        d = np.sum((q[0][:, None] - x[0][None]) ** 2, axis=-1)
        for s in range(8):
            in_ball = np.where(d[s] <= radius**2)[0]
            expect = list(in_ball[:nsample])
            if len(expect) == 0:
                expect = [0] * nsample
            while len(expect) < nsample:
                expect.append(expect[0])
            np.testing.assert_array_equal(got[0, s], np.array(expect))

    def test_precomputed_sqr_matches(self):
        """MSG's shared distance matrix gives identical groupings."""
        from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist

        x = RNG.rand(2, 64, 3).astype(np.float32)
        q = x[:, :16]
        sqr = pairwise_sqdist(jnp.asarray(q), jnp.asarray(x))
        for radius, nsample in ((0.2, 4), (0.4, 8)):
            a = np.asarray(
                ops.query_ball_point(
                    radius, nsample, jnp.asarray(x), jnp.asarray(q)
                )
            )
            b = np.asarray(
                ops.query_ball_point(
                    radius, nsample, jnp.asarray(x), jnp.asarray(q), sqr=sqr
                )
            )
            np.testing.assert_array_equal(a, b)


class TestGrouping:
    def test_shapes(self):
        x, _ = clouds(n=128)
        feats = RNG.randn(2, 128, 7).astype(np.float32)
        new_xyz, new_points = ops.sample_and_group(
            16, 0.4, 8, jnp.asarray(x), jnp.asarray(feats)
        )
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 10)

    def test_group_all(self):
        x, _ = clouds(n=128)
        new_xyz, new_points = ops.sample_and_group_all(jnp.asarray(x), None)
        assert new_xyz.shape == (2, 1, 3)
        assert new_points.shape == (2, 1, 128, 3)
        np.testing.assert_array_equal(np.asarray(new_xyz), 0.0)


class TestInterpolate:
    def test_exact_on_coincident_points(self):
        """Interpolating onto the source points returns the source feats."""
        src = RNG.randn(2, 20, 3).astype(np.float32)
        feat = RNG.randn(2, 20, 5).astype(np.float32)
        out = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(src), jnp.asarray(src), jnp.asarray(feat)
            )
        )
        # nearest neighbour is the point itself at distance 0 ->
        # 1/(0+eps) dominates the weights
        np.testing.assert_allclose(out, feat, atol=1e-3)

    def test_inverse_distance_oracle(self):
        dst = RNG.randn(1, 10, 3).astype(np.float32)
        src = RNG.randn(1, 12, 3).astype(np.float32)
        feat = RNG.randn(1, 12, 4).astype(np.float32)
        out = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(dst), jnp.asarray(src), jnp.asarray(feat)
            )
        )
        d = np.sum((dst[0][:, None] - src[0][None]) ** 2, axis=-1)
        idx = np.argsort(d, axis=-1)[:, :3]
        dd = np.take_along_axis(d, idx, axis=-1)
        w = 1.0 / (dd + 1e-8)
        w = w / w.sum(axis=-1, keepdims=True)
        expect = np.einsum("nk,nkc->nc", w, feat[0][idx])
        np.testing.assert_allclose(out[0], expect, atol=1e-4)


class TestGradients:
    def test_pairwise_grad_flows(self):
        x, y = clouds(n=16, m=16)

        def f(a):
            return jnp.sum(ops.pairwise_sqdist(a, jnp.asarray(y)))

        g = jax.grad(f)(jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g)))
