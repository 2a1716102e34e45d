"""Defense tests: SOR, SRS, DUP-Net."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.defense import sor_defense, srs_defense, DUPNet

RNG = np.random.RandomState(21)


class TestSOR:
    def test_removes_outlier(self):
        pc = RNG.randn(2, 128, 3).astype(np.float32) * 0.1
        pc[0, 0] = [50.0, 50.0, 50.0]  # blatant outlier
        out = np.asarray(sor_defense(jnp.asarray(pc), npoint=128))
        assert out.shape == (2, 128, 3)
        # the outlier must be gone
        assert not np.any(np.all(np.isclose(out[0], [50, 50, 50]), axis=-1))

    def test_pad_semantics(self):
        """Survivors are cyclically duplicated to npoint in order."""
        pc = RNG.randn(1, 64, 3).astype(np.float32) * 0.1
        pc[0, 10] = [30.0, 0, 0]
        out = np.asarray(sor_defense(jnp.asarray(pc), npoint=64))
        kept = np.delete(pc[0], 10, axis=0)  # 63 survivors in order
        np.testing.assert_allclose(out[0, :63], kept, atol=1e-6)
        np.testing.assert_allclose(out[0, 63], kept[0], atol=1e-6)

    def test_noop_on_uniform(self):
        # all points on a sphere shell -> no outliers -> identity
        pc = RNG.randn(1, 128, 3).astype(np.float32)
        pc /= np.linalg.norm(pc, axis=-1, keepdims=True)
        out = np.asarray(sor_defense(jnp.asarray(pc), npoint=128))
        # most points survive (mask threshold keeps alpha std)
        matches = np.isclose(out[0][:, None], pc[0][None], atol=1e-6).all(-1)
        assert matches.any(axis=1).mean() > 0.9


class TestSRS:
    def test_shape_and_subset(self):
        pc = RNG.randn(2, 128, 3).astype(np.float32)
        out = np.asarray(
            srs_defense(jnp.asarray(pc), jax.random.PRNGKey(0), drop_num=28)
        )
        assert out.shape == (2, 100, 3)
        for b in range(2):
            matches = np.isclose(
                out[b][:, None], pc[b][None], atol=1e-6
            ).all(-1)
            assert matches.any(axis=1).all()  # every output is an input

    def test_no_duplicates(self):
        pc = RNG.randn(1, 64, 3).astype(np.float32)
        out = np.asarray(
            srs_defense(jnp.asarray(pc), jax.random.PRNGKey(1), drop_num=16)
        )
        uniq = np.unique(out[0], axis=0)
        assert len(uniq) == 48


class TestDUPNet:
    def test_upsample_shape(self):
        dup = DUPNet(npoint=64, up_ratio=4)
        variables = dup.init(jax.random.PRNGKey(0))
        pc = jnp.asarray(RNG.randn(2, 80, 3).astype(np.float32) * 0.3)
        out = dup(variables, pc)
        assert out.shape == (2, 256, 3)
        assert np.all(np.isfinite(np.asarray(out)))
