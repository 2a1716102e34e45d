"""Smoke tests for SIadv, CTA, ISO, and Gen3DAdv attack families."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.attacks import siadv, cta, iso, gen3dadv
from pointcloudattack_tpu.utils.apply import make_model_fn


def _fn(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    return make_model_fn(model, variables), clouds, labels


class TestSIadv:
    def test_ifgm(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = siadv.SIAdvConfig(eps=0.45, step_size=0.02, max_steps=30,
                                normal_k=8)
        attack = siadv.build_si_ifgm(model_fn, model_fn, cfg)
        adv, pred, success = attack(
            jnp.asarray(clouds[:4]), jnp.asarray(labels[:4])
        )
        assert np.asarray(success).mean() >= 0.75
        norms = np.sqrt(((np.asarray(adv) - clouds[:4]) ** 2).sum(-1))
        assert norms.max() <= 0.45 + 1e-4

    def test_ifgm_normal_refresh_asr_parity(self, trained_pointnet):
        """normal_refresh=5 (recompute tangent frames every 5 steps
        instead of the reference's every step) keeps ASR and the Linf
        budget; the throughput win is measured in BENCH.md."""
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = siadv.SIAdvConfig(eps=0.45, step_size=0.02, max_steps=30,
                                normal_k=8, normal_refresh=5)
        attack = siadv.build_si_ifgm(model_fn, model_fn, cfg)
        adv, pred, success = attack(
            jnp.asarray(clouds[:4]), jnp.asarray(labels[:4])
        )
        assert np.asarray(success).mean() >= 0.75
        norms = np.sqrt(((np.asarray(adv) - clouds[:4]) ** 2).sum(-1))
        assert norms.max() <= 0.45 + 1e-4

    def test_simba(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = siadv.SIAdvConfig(step_size=0.4)
        attack = siadv.build_simba(model_fn, cfg)
        adv, pred, success, queries = attack(
            jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]),
            jax.random.PRNGKey(0),
        )
        assert np.all(np.isfinite(np.asarray(adv)))
        assert np.asarray(queries).min() >= 1

    def test_simbapp(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = siadv.SIAdvConfig(step_size=0.4)
        attack = siadv.build_simbapp(model_fn, model_fn, cfg)
        adv, pred, success, queries = attack(
            jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]),
            jax.random.PRNGKey(0),
        )
        assert np.all(np.isfinite(np.asarray(adv)))

    def test_query_attack(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = siadv.SIAdvConfig(eps=0.45, step_size=0.4, normal_k=8)
        attack = siadv.build_si_query_attack(model_fn, model_fn, cfg)
        adv, pred, success, queries = attack(
            jnp.asarray(clouds[:2]), jnp.asarray(labels[:2])
        )
        assert np.all(np.isfinite(np.asarray(adv)))


class TestCTA:
    def test_integrated_gradients_completeness(self, trained_pointnet):
        """IG should approximately satisfy sum(IG) ~ f(x) - f(baseline)."""
        model_fn, clouds, labels = _fn(trained_pointnet)
        x = jnp.asarray(clouds[:2])
        cls = jnp.asarray(labels[:2])
        ig = cta.integrated_gradients(model_fn, x, cls, steps=64)
        total = np.asarray(jnp.sum(ig, axis=(1, 2)))

        def score(inp):
            lg = model_fn(inp)
            return np.asarray(
                jnp.take_along_axis(lg, cls[:, None], axis=-1)
            )[:, 0]

        baseline = jnp.min(x, axis=(1, 2), keepdims=True) * jnp.ones_like(x)
        expect = score(x) - score(baseline)
        np.testing.assert_allclose(total, expect, rtol=0.25, atol=0.5)

    def test_attack_runs(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = cta.CTAConfig(
            ig_steps=8, inner_max_steps=100, total_max_steps=400, window=10
        )
        attack = cta.build_cta_attack(model_fn, cfg)
        adv, pred, success, steps = attack(
            jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]),
            jax.random.PRNGKey(0),
        )
        assert np.all(np.isfinite(np.asarray(adv)))
        assert int(steps) <= 400


class TestISO:
    def test_rotation_matrices_orthogonal(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            r = iso.rotation_xyz(rng.uniform(-np.pi, np.pi, 3))
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)
            np.testing.assert_allclose(abs(np.linalg.det(r)), 1.0, atol=1e-8)
        m = iso.reflection(rng.uniform(-np.pi, np.pi, 3))
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-8)

    def test_spectral_penalty_zero_for_rotation(self):
        r = jnp.asarray(
            iso.rotation_xyz(np.array([0.3, -0.5, 1.1])), dtype=jnp.float32
        )
        p = float(iso.spectral_penalty(r, jax.random.PRNGKey(0)))
        assert p < 1e-4
        w = r + 0.3
        assert float(iso.spectral_penalty(w, jax.random.PRNGKey(0))) > 0.05

    def test_thompson_attack(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        bandit = iso.BernThompson(d=4, a0=-np.pi, b0=np.pi, seed=0)
        w, success, tries = iso.thompson_sample_attack(
            model_fn, bandit, jnp.asarray(clouds[:1]),
            jnp.asarray(labels[:1]), num_init=8,
        )
        assert w.shape == (3, 3)
        assert tries <= 8

    def test_jnp_isometry_twins(self):
        """Batched jnp rotation/reflection match the numpy originals."""
        rng = np.random.RandomState(3)
        angles = rng.uniform(-np.pi, np.pi, (5, 3)).astype(np.float32)
        rot = np.asarray(iso._rotation_xyz_jnp(jnp.asarray(angles)))
        ref = np.asarray(iso._reflection_jnp(jnp.asarray(angles)))
        for i in range(5):
            np.testing.assert_allclose(
                rot[i], iso.rotation_xyz(angles[i]), atol=1e-5
            )
            np.testing.assert_allclose(
                ref[i], iso.reflection(angles[i]), atol=1e-5
            )

    def test_thompson_lockstep_matches_sequential_asr(
        self, trained_pointnet
    ):
        """Batched-Thompson TSI reaches the sequential mode's success
        level under the same per-sample probe budget (the posterior
        update order is the only deviation — attacks/iso.py)."""
        model_fn, clouds, labels = _fn(trained_pointnet)
        objs = jnp.asarray(clouds[:4])
        labs = jnp.asarray(labels[:4])

        seq_bandit = iso.BernThompson(d=4, a0=-np.pi, b0=np.pi, seed=0)
        probe = iso.build_tsi_probe(model_fn)
        seq_ok = []
        for i in range(4):
            _, ok, tries = iso.thompson_sample_attack(
                None, seq_bandit, objs[i : i + 1], labs[i : i + 1],
                num_init=12, probe=probe,
            )
            assert tries <= 12
            seq_ok.append(ok)

        lock_bandit = iso.BernThompson(d=4, a0=-np.pi, b0=np.pi, seed=0)
        ws, lock_ok, tries = iso.thompson_sample_attack_lockstep(
            lock_bandit, objs, labs, num_init=12, model_fn=model_fn,
        )
        # the device loop writes its posterior back to the host bandit
        assert lock_bandit.alpha.sum() + lock_bandit.beta.sum() > 2 * 64
        assert ws.shape == (4, 3, 3)
        assert (tries <= 12).all()
        # winning isometries actually fool the victim
        pred = np.argmax(
            np.asarray(model_fn(jnp.einsum("bnc,bdc->bnd", objs, ws))),
            axis=-1,
        )
        assert (pred[lock_ok] != np.asarray(labs)[lock_ok]).all()
        assert lock_ok.sum() >= sum(seq_ok) - 1  # same budget, same grid

    def test_ctri_batched_matches_sequential(self, trained_pointnet):
        """vmapped CTRI lanes reproduce solo B=1 runs (same keys): the
        while_loop's select-masking under vmap leaves each lane's
        trajectory untouched up to batched-matmul rounding (~1e-7);
        step counts and success flags match exactly."""
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = iso.ISOConfig(step_size=0.05, num_steps=40, lam=0.5)
        solo = iso.build_gradient_iso_attack(model_fn, cfg)
        batched = iso.build_gradient_iso_attack(model_fn, cfg, batched=True)

        k = 3
        objs = jnp.asarray(clouds[:k])
        labs = jnp.asarray(labels[:k])
        w0 = jnp.broadcast_to(jnp.eye(3), (k, 3, 3))
        keys = jnp.stack(
            [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(k)]
        )

        bw, bok, bpen, bsteps = batched(
            objs[:, None], labs[:, None], w0, keys
        )
        for i in range(k):
            sw, sok, spen, ssteps = solo(
                objs[i : i + 1], labs[i : i + 1], w0[i], keys[i]
            )
            np.testing.assert_allclose(
                np.asarray(sw), np.asarray(bw[i]), atol=1e-5
            )
            assert bool(np.asarray(sok).all()) == bool(
                np.asarray(bok[i]).all()
            )
            np.testing.assert_allclose(float(spen), float(bpen[i]), atol=1e-5)
            assert int(ssteps) == int(bsteps[i])

    def test_gradient_attack(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = iso.ISOConfig(step_size=0.05, num_steps=100, lam=0.5)
        attack = iso.build_gradient_iso_attack(model_fn, cfg)
        w, success, pen, steps = attack(
            jnp.asarray(clouds[:1]), jnp.asarray(labels[:1]),
            jnp.eye(3, dtype=jnp.float32), jax.random.PRNGKey(0),
        )
        assert np.asarray(success).all()


class TestGen3DAdv:
    def test_critical_points(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cri = gen3dadv.get_critical_points(
            model_fn, jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]), 16
        )
        assert cri.shape == (2, 16, 3)

    def test_dbscan(self):
        rng = np.random.RandomState(0)
        a = rng.randn(20, 3) * 0.05
        b = rng.randn(20, 3) * 0.05 + 5.0
        labels = gen3dadv.dbscan_numpy(
            np.concatenate([a, b]), eps=0.5, min_samples=3
        )
        assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
        assert labels[0] != labels[20]

    def test_add_points(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        # the reference's 5e3 weight suits 512 added points on ModelNet;
        # scale it down for the 16-point tiny fixture
        cfg = gen3dadv.AddPointsConfig(
            binary_step=2, num_iter=150, num_add=16, kappa=0.0,
            init_weight=1.0, max_weight=10.0,
        )
        attack = gen3dadv.build_add_points_attack(model_fn, cfg)
        full, added, dist, success = attack(
            jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]),
            jax.random.PRNGKey(0),
        )
        assert full.shape == (2, 64 + 16, 3)
        assert np.asarray(success).mean() >= 0.5

    def test_add_clusters(self, trained_pointnet):
        model_fn, clouds, labels = _fn(trained_pointnet)
        cfg = gen3dadv.AddClustersConfig(
            binary_step=2, num_iter=50, num_add=2, cl_num_p=8,
            num_critical=32, kappa=0.0,
        )
        attack = gen3dadv.build_add_clusters_attack(model_fn, cfg)
        full, added, dist, success = attack(
            jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]),
            jax.random.PRNGKey(0),
        )
        assert full.shape == (2, 64 + 16, 3)
        assert np.all(np.isfinite(np.asarray(full)))


def test_cta_with_distance_penalty(trained_pointnet):
    """CTA_sumloss variant (hausdorff penalty) runs."""
    model_fn, clouds, labels = _fn(trained_pointnet)
    cfg = cta.CTAConfig(
        ig_steps=4, inner_max_steps=60, total_max_steps=150, window=10,
        penalize_dis="hausdorff", beta=0.5,
    )
    attack = cta.build_cta_attack(model_fn, cfg)
    adv, pred, success, steps = attack(
        jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]),
        jax.random.PRNGKey(0),
    )
    assert np.all(np.isfinite(np.asarray(adv)))


def test_critical_points_more_than_n(trained_pointnet):
    """num_add > N cycles the ranked indices instead of crashing."""
    model_fn, clouds, labels = _fn(trained_pointnet)
    cri = gen3dadv.get_critical_points(
        model_fn, jnp.asarray(clouds[:2]), jnp.asarray(labels[:2]), 100
    )
    assert cri.shape == (2, 100, 3)
