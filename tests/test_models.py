"""Model forward/backward sanity tests (CPU, small clouds)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudattack_tpu import models

NUM_CLASSES = 7


def make(name, **kw):
    model = models.make_model(name, NUM_CLASSES, **kw)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=256, batch=2
    )
    return model, variables


def cloud(b=2, n=256):
    rng = np.random.RandomState(3)
    return jnp.asarray(rng.randn(b, n, 3).astype(np.float32))


@pytest.mark.parametrize("name", models.MODEL_NAMES)
def test_forward_shape_and_finite(name):
    if name == "CurveNet":
        pytest.skip("covered in test_curvenet_forward (npoint config)")
    model, variables = make(name)
    out, aux = model.apply(variables, cloud(), train=False)
    assert out.shape == (2, NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))
    if models.OUTPUT_KIND[name] == "log_probs":
        probs = np.exp(np.asarray(out))
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-4)


def test_curvenet_forward():
    # CurveNet's CIC chain expects >=1024 input points (npoint=1024 stages)
    model = models.make_model("CurveNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=1024, batch=1
    )
    out, _ = model.apply(variables, cloud(b=1, n=1024), train=False)
    assert out.shape == (1, NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", ["PointNet", "DGCNN"])
def test_input_gradients_flow(name):
    """Attacks need d loss / d input — check it is finite and nonzero."""
    model, variables = make(name)
    x = cloud()

    def loss(inp):
        out, _ = model.apply(variables, inp, train=False)
        return out[:, 0].sum()

    g = jax.grad(loss)(x)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_pointnet_stn_is_identity_at_init():
    """Zero-init STN head -> transform starts as the identity matrix."""
    model, variables = make("PointNet")
    _, aux = model.apply(variables, cloud(), train=False)
    trans = np.asarray(aux["trans"])
    np.testing.assert_allclose(
        trans, np.broadcast_to(np.eye(3), trans.shape), atol=1e-5
    )


def test_pointnet_permutation_invariance():
    model, variables = make("PointNet")
    x = cloud(b=1)
    perm = np.random.RandomState(0).permutation(256)
    out1, _ = model.apply(variables, x, train=False)
    out2, _ = model.apply(variables, x[:, perm], train=False)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), atol=1e-4
    )


def test_feature_transform_regularizer():
    eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    assert float(models.feature_transform_regularizer(eye)) < 1e-6
    skew = eye + 0.5
    assert float(models.feature_transform_regularizer(skew)) > 0.1


def test_train_mode_updates_batch_stats():
    model, variables = make("PointNet")
    out, new_state = model.apply(
        variables,
        cloud(),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(old, new)
    )
    assert changed


def test_dgcnn_gather_modes_agree():
    """tri (three truncated limbs) must match the exact gather to f32
    noise; hilo (two limbs) closely; bf16 (one limb) more loosely."""
    import jax
    import jax.numpy as jnp
    from pointcloudattack_tpu import models

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    outs = {}
    for mode in ("exact", "tri", "hilo", "bf16"):
        model = models.make_model(
            "DGCNN", 6, emb_dims=64, gather_mode=mode
        )
        variables = models.init_model(model, jax.random.PRNGKey(0), 128, 1)
        out, _ = model.apply(variables, x, train=False)
        outs[mode] = np.asarray(out)
    np.testing.assert_allclose(outs["tri"], outs["exact"], atol=1e-5)
    np.testing.assert_allclose(outs["hilo"], outs["exact"], atol=2e-3)
    np.testing.assert_allclose(outs["bf16"], outs["exact"], atol=0.1)


def test_bf16_limb_decomposition_exact():
    """Three truncation limbs reconstruct f32 bit-exactly — and the
    limbs are NON-ZERO (the astype round-trip variant was folded to
    zero by XLA's excess-precision pass on TPU; the bitcast masking
    must survive everywhere)."""
    import jax
    import jax.numpy as jnp
    from pointcloudattack_tpu.models.dgcnn import _bf16_limbs

    rng = np.random.RandomState(7)
    x = jnp.asarray((rng.randn(64, 32) * 100).astype(np.float32))
    limbs = jax.jit(lambda a: _bf16_limbs(a, 3))(x)
    assert all(float(jnp.abs(l).max()) > 0 for l in limbs)
    recon = sum(l.astype(jnp.float32) for l in limbs)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(x))


def test_limb_gather_bf16_input():
    """bf16 inputs (the compute_dtype=bf16 path) must flow through the
    MXU gather modes without the uint32 bitcast crashing, stay bf16,
    and match the exact gather bitwise (bf16 is one exact limb)."""
    import jax
    import jax.numpy as jnp
    from pointcloudattack_tpu.models.dgcnn import graph_feature

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32)).astype(
        jnp.bfloat16
    )
    out_exact = jax.jit(lambda a: graph_feature(a, 4, "exact"))(x)
    for mode in ("tri", "hilo", "bf16"):
        out = jax.jit(lambda a, m=mode: graph_feature(a, 4, m))(x)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(out, dtype=np.float32),
            np.asarray(out_exact, dtype=np.float32),
        )


def test_limb_gather_bf16_input_grad():
    """jax.grad through the MXU gather with bf16 primals (the
    compute_dtype=bf16 path on a DGCNN victim) must produce a bf16
    cotangent matching the exact gather's — the custom_vjp backward
    returns the primal dtype, not unconditional f32 (round-2 advisor
    finding: f32 dx summed with a bf16 central-feature cotangent
    crashed lax.add at trace time)."""
    import jax
    import jax.numpy as jnp
    from pointcloudattack_tpu.models.dgcnn import graph_feature

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.randn(2, 64, 4, 16).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def loss(a, mode):
        return jnp.sum(
            graph_feature(a, 4, mode).astype(jnp.float32)
            * w.astype(jnp.float32)
        )

    g_exact = jax.grad(lambda a: loss(a, "exact"))(x)
    for mode in ("tri", "hilo", "bf16"):
        g = jax.grad(lambda a, m=mode: loss(a, m))(x)
        assert g.dtype == jnp.bfloat16
        # not bitwise: the exact path scatter-adds cotangents in bf16,
        # ours accumulates in f32 then rounds once (strictly tighter);
        # difference is one bf16 ulp of the accumulated sum
        np.testing.assert_allclose(
            np.asarray(g, dtype=np.float32),
            np.asarray(g_exact, dtype=np.float32),
            rtol=0.04,
            atol=0.1,
        )


def test_tri_gather_value_and_grad_match_exact():
    """graph_feature 'tri' equals 'exact' in value (f32) and gradient
    (the custom_vjp backward is the exact one-hot transpose)."""
    import jax
    import jax.numpy as jnp
    from pointcloudattack_tpu.models.dgcnn import graph_feature

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 96, 16).astype(np.float32))

    f_exact = jax.jit(lambda a: graph_feature(a, 8, "exact"))
    f_tri = jax.jit(lambda a: graph_feature(a, 8, "tri"))
    np.testing.assert_allclose(
        np.asarray(f_tri(x)), np.asarray(f_exact(x)), atol=1e-6
    )

    w = jnp.asarray(rng.randn(2, 96, 8, 32).astype(np.float32))
    g_exact = jax.grad(lambda a: jnp.sum(graph_feature(a, 8, "exact") * w))(x)
    g_tri = jax.grad(lambda a: jnp.sum(graph_feature(a, 8, "tri") * w))(x)
    np.testing.assert_allclose(
        np.asarray(g_tri), np.asarray(g_exact), rtol=1e-5, atol=1e-5
    )


class TestFusedPolicy:
    """Tri-state force knobs vs the per-victim FUSED_POLICY table
    (models/common.py — round-4 defaults from the measured TPU A/B,
    decision data in BENCH.md)."""

    def _with(self, enabled, gather, fn):
        from pointcloudattack_tpu.models.common import FUSED_MAXPOOL

        prior = dict(FUSED_MAXPOOL)
        FUSED_MAXPOOL["enabled"] = enabled
        FUSED_MAXPOOL["gather"] = gather
        try:
            return fn()
        finally:
            FUSED_MAXPOOL.update(prior)

    def test_policy_defaults(self):
        from pointcloudattack_tpu.models.common import (
            fused_chain_on,
            fused_gather_on,
        )

        f32, bf16 = jnp.float32, jnp.bfloat16
        checks = lambda: (
            fused_chain_on("pointnet", f32),
            fused_chain_on("pointnet", bf16),  # bf16: XLA fusion wins
            fused_chain_on("dgcnn", f32),      # measured regression
            fused_gather_on("ssg", f32),
            fused_gather_on("dgcnn", f32),
            # careful 3-arm A/B: XLA 3.52 clouds/s beats chain 2.74
            # and chain+gather 3.35 (BENCH.md cw_curvenet bullet)
            fused_chain_on("curvenet", f32),
            fused_gather_on("curvenet", f32),
        )
        assert self._with(None, None, checks) == (
            True, False, False, True, False, False, False
        )

    def test_force_flags_override_policy(self):
        from pointcloudattack_tpu.models.common import (
            fused_chain_on,
            fused_gather_on,
        )

        f32 = jnp.float32
        on = self._with(True, True, lambda: (
            fused_chain_on("dgcnn", f32), fused_gather_on("dgcnn", f32)
        ))
        assert on == (True, True)
        off = self._with(False, False, lambda: (
            fused_chain_on("pointnet", f32), fused_gather_on("ssg", f32)
        ))
        assert off == (False, False)

    def test_master_kill_switch_disables_gather(self):
        # enabled=False must kill the gather tier even when the gather
        # knob itself is forced on (the gather kernel subsumes the
        # chain — one kill switch turns EVERYTHING off)
        from pointcloudattack_tpu.models.common import fused_gather_on

        assert self._with(
            False, True, lambda: fused_gather_on("ssg", jnp.float32)
        ) is False

    def test_unknown_family_falls_through(self):
        from pointcloudattack_tpu.models.common import (
            fused_chain_on,
            fused_gather_on,
        )

        res = self._with(None, None, lambda: (
            fused_chain_on("", jnp.float32),
            fused_gather_on("", jnp.float32),
        ))
        assert res == (True, False)  # chain default-on, gather opt-in

    def test_fused_state_string(self):
        from pointcloudattack_tpu.models.common import fused_state

        assert self._with(
            None, None, fused_state
        ) == "chain=policy gather=policy"
        assert self._with(True, False, fused_state) == "chain=on gather=off"
