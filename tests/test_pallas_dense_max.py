"""Fused Dense+eval-BN+maxpool kernel (ops/pallas/dense_max_kernel.py).

CPU tests run the kernel through the Pallas interpreter.  The kernel's
matmul truncates operands to bf16 with f32 accumulation (= XLA's DEFAULT
f32 dot precision on TPU), so the exact oracle here applies the same
truncation; the pure-f32 comparison is model-level with loose tolerance.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudattack_tpu.models import common as mcommon
from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
    dense_bn_maxpool,
    mlp_chain_maxpool,
    reference_dense_bn_maxpool,
)


def _params(key, cin, cout, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    w = jax.random.normal(ks[0], (cin, cout), dtype) * 0.2
    b = jax.random.normal(ks[1], (cout,), dtype) * 0.1
    mean = jax.random.normal(ks[2], (cout,), dtype) * 0.05
    mul = jax.random.normal(ks[3], (cout,), dtype) * 0.5 + 1.0
    beta = jax.random.normal(ks[4], (cout,), dtype) * 0.1
    return w, b, mean, mul, beta


def _bf16_oracle(x, w, b, mean, mul, beta):
    """Same math as the kernel: bf16-truncated matmul, f32 epilogue."""
    z = jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    f = lambda a: a.astype(jnp.float32)
    z = (z + f(b) - f(mean)) * f(mul) + f(beta)
    return jnp.max(z, axis=1)


@pytest.mark.parametrize("n", [256, 512, 300])  # 300: pad path
@pytest.mark.parametrize("cin", [64, 128])
def test_forward_matches_bf16_oracle(n, cin):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, n, cin))
    w, b, mean, mul, beta = _params(key, cin, 512)
    got = dense_bn_maxpool(x, w, b, mean, mul, beta, True)
    want = _bf16_oracle(x, w, b, mean, mul, beta)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_input_gradient_matches_oracle():
    """dx through the one-hot MXU backward == autodiff of the oracle."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 64))
    w, b, mean, mul, beta = _params(key, 64, 512)
    dy = jax.random.normal(jax.random.PRNGKey(4), (2, 512))

    f_kernel = lambda a: jnp.sum(
        dense_bn_maxpool(a, w, b, mean, mul, beta, True) * dy
    )
    f_oracle = lambda a: jnp.sum(_bf16_oracle(a, w, b, mean, mul, beta) * dy)
    gk = jax.grad(f_kernel)(x)
    go = jax.grad(f_oracle)(x)
    # same winners (tie-free random data) => same sparse cotangent rows.
    # The kernel truncates the cotangent to bf16 before its MXU matmul
    # (as the TPU's DEFAULT-precision backward dot does); the CPU oracle
    # autodiff keeps dz in f32 — hence the loose atol.
    np.testing.assert_allclose(np.asarray(gk), np.asarray(go), rtol=2e-2,
                               atol=1e-2)


def test_param_gradients_match_f32_reference():
    """Weight/BN cotangents are the f32 reference chain's by design
    (the custom bwd delegates them to jax.vjp of the unfused oracle) —
    assert the wiring end-to-end."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 256, 64))
    args = _params(key, 64, 512)

    gk = jax.grad(
        lambda *p: jnp.sum(dense_bn_maxpool(x, *p, True) ** 2),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    go = jax.grad(
        lambda *p: jnp.sum(reference_dense_bn_maxpool(x, *p) ** 2),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    # the fused op's primal y is the bf16-matmul value, so dy = 2y
    # differs from the f32 reference's at bf16-rounding scale — hence
    # loose-ish elementwise tolerance on otherwise identical formulas
    for a, b_, name in zip(gk, go, ["w", "b", "mean", "mul", "beta"]):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        err = np.linalg.norm(a - b_) / max(np.linalg.norm(b_), 1e-9)
        assert err < 1e-2, f"{name}: rel frobenius err {err}"


def test_bf16_input_dtype_roundtrip():
    """bf16 activations: y f32, dx comes back bf16 (cotangent dtype)."""
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(
        jax.random.PRNGKey(8), (2, 256, 64)
    ).astype(jnp.bfloat16)
    w, b, mean, mul, beta = _params(key, 64, 512, dtype=jnp.bfloat16)
    y = dense_bn_maxpool(x, w, b, mean, mul, beta, True)
    assert y.dtype == jnp.float32
    g = jax.grad(
        lambda a: jnp.sum(
            dense_bn_maxpool(a, w, b, mean, mul, beta, True)
        ).astype(jnp.float32)
    )(x)
    assert g.dtype == jnp.bfloat16


def test_reference_oracle_is_unfused_sequence():
    """reference_dense_bn_maxpool == hand-rolled Dense+BN+max in f32."""
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 128, 32))
    w, b, mean, mul, beta = _params(key, 32, 512)
    want = jnp.max((x @ w + b - mean) * mul + beta, axis=1)
    got = reference_dense_bn_maxpool(x, w, b, mean, mul, beta)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6
    )


def _chain_layers(key, dims):
    return tuple(
        _params(k, cin, cout)
        for k, cin, cout in zip(
            jax.random.split(key, len(dims) - 1), dims[:-1], dims[1:]
        )
    )


def _bf16_chain_oracle(x, layers):
    """Same math as the chain kernel: bf16-truncated matmuls, f32
    epilogues, ReLU between layers (not after the last)."""
    h = x.astype(jnp.float32)
    for li, (w, b, mean, mul, beta) in enumerate(layers):
        z = jax.lax.dot_general(
            h.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dimension_numbers=(((1 if h.ndim == 2 else 2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        f = lambda a: a.astype(jnp.float32)
        z = (z + f(b) - f(mean)) * f(mul) + f(beta)
        h = jnp.maximum(z, 0.0) if li < len(layers) - 1 else z
    return jnp.max(h, axis=1)


@pytest.mark.parametrize("n", [256, 300])  # 300: pad path
def test_chain_forward_matches_oracle(n):
    """3-layer chain (the PointNet mlp1->mlp2->mlp3 spine shape)."""
    x = jax.random.normal(jax.random.PRNGKey(20), (2, n, 8))
    layers = _chain_layers(jax.random.PRNGKey(21), (8, 64, 128, 512))
    got = mlp_chain_maxpool(x, layers, True)
    want = _bf16_chain_oracle(x, layers)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_chain_wide_input_matches_oracle():
    """643-wide C0 (PointNet++ MSG SA3's concat input — the widest
    dense-chain dispatch the gate admits)."""
    x = jax.random.normal(jax.random.PRNGKey(26), (2, 128, 643))
    layers = _chain_layers(jax.random.PRNGKey(27), (643, 256, 512))
    got = mlp_chain_maxpool(x, layers, True)
    want = _bf16_chain_oracle(x, layers)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_chain_input_gradient_matches_oracle():
    """dx through the recompute-chain backward == oracle autodiff."""
    x = jax.random.normal(jax.random.PRNGKey(22), (2, 256, 8))
    layers = _chain_layers(jax.random.PRNGKey(23), (8, 64, 128, 512))
    dy = jax.random.normal(jax.random.PRNGKey(24), (2, 512))
    gk = jax.grad(
        lambda a: jnp.sum(mlp_chain_maxpool(a, layers, True) * dy)
    )(x)
    go = jax.grad(
        lambda a: jnp.sum(_bf16_chain_oracle(a, layers) * dy)
    )(x)
    # kernel truncates each backward cotangent to bf16 (the TPU DEFAULT
    # backward-dot behavior); the CPU oracle keeps them f32
    ak, ao = np.asarray(gk, np.float64), np.asarray(go, np.float64)
    err = np.linalg.norm(ak - ao) / max(np.linalg.norm(ao), 1e-9)
    assert err < 2e-2, f"rel frobenius err {err}"


def test_chain_param_gradients_defined():
    """Weight cotangents exist (training-style use), with the f32
    reference chain's values (the custom bwd delegates to its vjp)."""
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        reference_mlp_chain_maxpool,
    )

    x = jax.random.normal(jax.random.PRNGKey(25), (2, 256, 8))
    layers = _chain_layers(jax.random.PRNGKey(26), (8, 64, 512))
    gl = jax.grad(
        lambda ls: jnp.sum(mlp_chain_maxpool(x, ls, True) ** 2)
    )(layers)
    go = jax.grad(
        lambda ls: jnp.sum(reference_mlp_chain_maxpool(x, ls) ** 2)
    )(layers)
    for lt, (lk, lo) in enumerate(zip(gl, go)):
        for a, b_ in zip(lk, lo):
            assert a.shape == b_.shape and a.dtype == b_.dtype
        ak = np.concatenate([np.ravel(a) for a in lk]).astype(np.float64)
        ao = np.concatenate([np.ravel(a) for a in lo]).astype(np.float64)
        err = np.linalg.norm(ak - ao) / max(np.linalg.norm(ao), 1e-9)
        # dy = 2y differs at bf16-matmul rounding scale between the two
        assert err < 1e-2, f"layer {lt}: rel frobenius err {err}"


class TestPointNetFusedPath:
    """PointNet with the fused tail (interpret mode) vs the XLA path."""

    def _model(self, feature_transform=False):
        from pointcloudattack_tpu import models

        m = models.make_model("PointNet", 8)
        if feature_transform:
            m = type(m)(num_classes=8, feature_transform=True)
        v = models.init_model(
            m, jax.random.PRNGKey(0), num_points=128, batch=2
        )
        return m, v

    @pytest.mark.parametrize("feature_transform", [False, True])
    def test_forward_and_grad_parity(self, monkeypatch, feature_transform):
        m, v = self._model(feature_transform)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 128, 3)) * 0.5

        lp_std, _ = m.apply(v, x, train=False)
        g_std = jax.grad(
            lambda a: m.apply(v, a, train=False)[0][:, 0].sum()
        )(x)

        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        lp_fused, _ = m.apply(v, x, train=False)
        g_fused = jax.grad(
            lambda a: m.apply(v, a, train=False)[0][:, 0].sum()
        )(x)

        # CPU XLA matmuls are true f32; the kernel truncates to bf16
        # (the TPU default) — so CPU parity is loose, class parity exact
        np.testing.assert_allclose(
            np.asarray(lp_fused), np.asarray(lp_std), atol=0.2
        )
        assert (
            np.asarray(jnp.argmax(lp_fused, -1))
            == np.asarray(jnp.argmax(lp_std, -1))
        ).all()
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_std), atol=0.05
        )

    def test_train_mode_never_fuses(self, monkeypatch):
        """train=True must use live-batch BN stats (standard path)."""
        m, v = self._model()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 3))

        def boom(*a, **k):  # any fused call in train mode is a bug
            raise AssertionError("fused kernel used in train mode")

        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        monkeypatch.setattr(mcommon, "mlp_chain_maxpool", boom)
        lp, _ = m.apply(
            v, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )[0]
        assert lp.shape == (2, 8)

    def test_kill_switch(self, monkeypatch):
        m, v = self._model()
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 3))

        def boom(*a, **k):
            raise AssertionError("fused kernel used while disabled")

        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "enabled", False)
        monkeypatch.setattr(mcommon, "mlp_chain_maxpool", boom)
        lp, _ = m.apply(v, x, train=False)
        assert lp.shape == (2, 8)


# ---------------------------------------------------------------------------
# Grouped (set-abstraction) variant: chain + max over the nsample axis
# ---------------------------------------------------------------------------

from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (  # noqa: E402
    mlp_chain_groupmax,
    reference_mlp_chain_groupmax,
)


def _bf16_group_oracle(x, layers):
    """bf16-truncated matmuls, f32 epilogues, ReLU between layers."""
    h = x.astype(jnp.float32)
    for li, (w, b, mean, mul, beta) in enumerate(layers):
        z = jax.lax.dot_general(
            h.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        f = lambda a: a.astype(jnp.float32)
        z = (z + f(b) - f(mean)) * f(mul) + f(beta)
        h = jnp.maximum(z, 0.0) if li < len(layers) - 1 else z
    return jnp.max(h, axis=2)


@pytest.mark.parametrize("g,k", [(32, 16), (7, 32), (1, 128)])
def test_groupmax_forward_matches_oracle(g, k):
    """(7, 32): g not divisible by groups-per-block; (1, 128): group_all."""
    x = jax.random.normal(jax.random.PRNGKey(30), (2, g, k, 3))
    layers = _chain_layers(jax.random.PRNGKey(31), (3, 32, 32, 64))
    got = mlp_chain_groupmax(x, layers, True)
    want = _bf16_group_oracle(x, layers)
    assert got.shape == (2, g, 64)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_groupmax_input_gradient_matches_oracle():
    x = jax.random.normal(jax.random.PRNGKey(32), (2, 32, 16, 3))
    layers = _chain_layers(jax.random.PRNGKey(33), (3, 32, 64))
    dy = jax.random.normal(jax.random.PRNGKey(34), (2, 32, 64))
    gk = jax.grad(
        lambda a: jnp.sum(mlp_chain_groupmax(a, layers, True) * dy)
    )(x)
    go = jax.grad(
        lambda a: jnp.sum(_bf16_group_oracle(a, layers) * dy)
    )(x)
    ak, ao = np.asarray(gk, np.float64), np.asarray(go, np.float64)
    err = np.linalg.norm(ak - ao) / max(np.linalg.norm(ao), 1e-9)
    assert err < 2e-2, f"rel frobenius err {err}"


def test_groupmax_param_gradients_defined():
    x = jax.random.normal(jax.random.PRNGKey(35), (2, 8, 16, 3))
    layers = _chain_layers(jax.random.PRNGKey(36), (3, 32, 64))
    gl = jax.grad(
        lambda ls: jnp.sum(mlp_chain_groupmax(x, ls, True) ** 2)
    )(layers)
    go = jax.grad(
        lambda ls: jnp.sum(reference_mlp_chain_groupmax(x, ls) ** 2)
    )(layers)
    for lt, (lk, lo) in enumerate(zip(gl, go)):
        ak = np.concatenate([np.ravel(a) for a in lk]).astype(np.float64)
        ao = np.concatenate([np.ravel(a) for a in lo]).astype(np.float64)
        err = np.linalg.norm(ak - ao) / max(np.linalg.norm(ao), 1e-9)
        assert err < 1e-2, f"layer {lt}: rel frobenius err {err}"


class TestPointNet2FusedPath:
    """SSG/MSG with the fused grouped chain (interpret) vs XLA path."""

    @pytest.mark.parametrize("arch", ["PointNet++Ssg", "PointNet++Msg"])
    def test_forward_and_grad_parity(self, monkeypatch, arch):
        from pointcloudattack_tpu import models

        m = models.make_model(arch, 8)
        v = models.init_model(
            m, jax.random.PRNGKey(0), num_points=128, batch=2
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3)) * 0.5

        lp_std, _ = m.apply(v, x, train=False)
        g_std = jax.grad(
            lambda a: m.apply(v, a, train=False)[0][:, 0].sum()
        )(x)

        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        lp_fused, _ = m.apply(v, x, train=False)
        g_fused = jax.grad(
            lambda a: m.apply(v, a, train=False)[0][:, 0].sum()
        )(x)

        np.testing.assert_allclose(
            np.asarray(lp_fused), np.asarray(lp_std), atol=0.2
        )
        assert (
            np.asarray(jnp.argmax(lp_fused, -1))
            == np.asarray(jnp.argmax(lp_std, -1))
        ).all()
        # three stacked SA levels compound bf16-vs-f32 winner flips on
        # the CPU comparison (on TPU both paths run bf16 matmuls), so
        # the model-level gradient check is directional; the tight
        # per-op check is test_sa_module_matches_bf16_oracle below
        gf, gs = np.asarray(g_fused, np.float64), np.asarray(g_std, np.float64)
        cos = float(
            (gf * gs).sum()
            / max(np.linalg.norm(gf) * np.linalg.norm(gs), 1e-12)
        )
        assert cos > 0.95, f"input-grad cosine {cos}"

    def test_sa_module_matches_bf16_oracle(self, monkeypatch):
        """One SetAbstraction: fused path == bf16 chain oracle (tight).

        Validates the wiring — param extraction, BN folding, relu-after-
        pool — without hierarchy compounding.
        """
        from pointcloudattack_tpu.models.pointnet2 import SetAbstraction

        m = SetAbstraction(16, 0.4, 16, [16, 32, 64])
        xyz = jax.random.normal(jax.random.PRNGKey(40), (2, 64, 3)) * 0.5
        v = m.init(jax.random.PRNGKey(41), xyz, None)

        def run(x):
            _, pooled = m.apply(v, x, None, train=False)
            return pooled

        std = run(xyz)
        g_std = jax.grad(lambda a: run(a)[:, :, 0].sum())(xyz)
        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        fused = run(xyz)
        g_fused = jax.grad(lambda a: run(a)[:, :, 0].sum())(xyz)

        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(std), rtol=2e-2, atol=2e-2
        )
        gf = np.asarray(g_fused, np.float64)
        gs = np.asarray(g_std, np.float64)
        err = np.linalg.norm(gf - gs) / max(np.linalg.norm(gs), 1e-9)
        assert err < 5e-2, f"input-grad rel frobenius err {err}"


class TestDGCNNFusedEdgeConv:
    """EdgeConv fused Dense+BN+max-over-k (leaky applied post-pool)."""

    def test_edgeconv_module_matches_bf16_oracle(self, monkeypatch):
        """Fused EdgeConv == a bf16-matmul oracle built from the same
        params (the CPU standard path uses f32 matmuls, whose near-tie
        argmax winners differ from the kernel's TPU-DEFAULT bf16 ones —
        measured 42/8192 flips — so the oracle shares the kernel's
        matmul precision; k=20 exercises the non-8-aligned K path)."""
        import flax.linen as nn

        from pointcloudattack_tpu.models.dgcnn import EdgeConv, graph_feature

        m = EdgeConv(64, k=20, gather_mode="exact")
        x = jax.random.normal(jax.random.PRNGKey(50), (2, 64, 3)) * 0.5
        v = m.init(jax.random.PRNGKey(51), x)
        pw = v["params"]["Dense_0"]["kernel"]
        pb = v["params"]["BatchNorm_0"]
        st = v["batch_stats"]["BatchNorm_0"]
        mul = jax.lax.rsqrt(st["var"] + 1e-5) * pb["scale"]

        def oracle(a):
            e = graph_feature(a, 20, "exact")
            z = jax.lax.dot_general(
                e.astype(jnp.bfloat16),
                pw.astype(jnp.bfloat16),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z = (z - st["mean"]) * mul + pb["bias"]
            return nn.leaky_relu(jnp.max(z, axis=2), negative_slope=0.2)

        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        # force the chain tier on: the shipped FUSED_POLICY turns it
        # off for dgcnn (measured regression), but this test is about
        # the KERNEL, not the policy
        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "enabled", True)
        fused = m.apply(v, x, train=False)
        g_fused = jax.grad(
            lambda a: m.apply(v, a, train=False)[:, :, 0].sum()
        )(x)
        want = oracle(x)
        g_want = jax.grad(lambda a: oracle(a)[:, :, 0].sum())(x)

        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(want), rtol=1e-5, atol=1e-5
        )
        gf = np.asarray(g_fused, np.float64)
        gs = np.asarray(g_want, np.float64)
        err = np.linalg.norm(gf - gs) / max(np.linalg.norm(gs), 1e-9)
        assert err < 2e-2, f"input-grad rel frobenius err {err}"

    def test_dgcnn_model_parity(self, monkeypatch):
        from pointcloudattack_tpu import models

        m = models.make_model("DGCNN", 8, k=8)
        v = models.init_model(
            m, jax.random.PRNGKey(0), num_points=64, batch=2
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3)) * 0.5
        lp_std, _ = m.apply(v, x, train=False)
        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "enabled", True)
        lp_fused, _ = m.apply(v, x, train=False)
        np.testing.assert_allclose(
            np.asarray(lp_fused), np.asarray(lp_std), atol=0.2
        )
        assert (
            np.asarray(jnp.argmax(lp_fused, -1))
            == np.asarray(jnp.argmax(lp_std, -1))
        ).all()
        g = jax.grad(
            lambda a: m.apply(v, a, train=False)[0][:, 0].sum()
        )(x)
        assert np.isfinite(np.asarray(g)).all()


def test_punet_fused_sa_matches_standard(monkeypatch):
    """PU-Net forward with fused SAs (identity BN vectors) vs standard.

    PU-Net's _MLP has no BatchNorm, so both paths run the same bf16-vs-
    f32 matmul question only at the interpret/kernel boundary; argmax
    flips show up as per-point diffs — check value closeness and grad
    direction.
    """
    from pointcloudattack_tpu.models.punet import PUNet

    m = PUNet(npoint=64, up_ratio=2)
    x = jax.random.normal(jax.random.PRNGKey(60), (2, 64, 3)) * 0.5
    v = m.init(jax.random.PRNGKey(61), x)

    std = m.apply(v, x)
    g_std = jax.grad(lambda a: m.apply(v, a).sum())(x)
    monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
    fused = m.apply(v, x)
    g_fused = jax.grad(lambda a: m.apply(v, a).sum())(x)

    assert fused.shape == std.shape == (2, 128, 3)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(std), rtol=5e-2, atol=5e-2
    )
    gf, gs = np.asarray(g_fused, np.float64), np.asarray(g_std, np.float64)
    cos = float(
        (gf * gs).sum()
        / max(np.linalg.norm(gf) * np.linalg.norm(gs), 1e-12)
    )
    assert cos > 0.97, f"input-grad cosine {cos}"


def test_groupmean_forward_and_grad_matches_oracle():
    """Mean-pool grouped chain (CurveNet LPFA pattern, leaky slope)."""
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        mlp_chain_groupmean,
        reference_mlp_chain_groupmean,
    )

    x = jax.random.normal(jax.random.PRNGKey(70), (2, 16, 20, 6))
    layers = _chain_layers(jax.random.PRNGKey(71), (6, 64, 64))
    got = mlp_chain_groupmean(x, layers, True, 0.2)
    want = reference_mlp_chain_groupmean(x, layers, 0.2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )
    gk = jax.grad(
        lambda a: jnp.sum(mlp_chain_groupmean(a, layers, True, 0.2) ** 2)
    )(x)
    go = jax.grad(
        lambda a: jnp.sum(
            reference_mlp_chain_groupmean(a, layers, 0.2) ** 2
        )
    )(x)
    ak, ao = np.asarray(gk, np.float64), np.asarray(go, np.float64)
    err = np.linalg.norm(ak - ao) / max(np.linalg.norm(ao), 1e-9)
    assert err < 5e-2, f"rel frobenius err {err}"


def test_curvenet_lpfa_fused_matches_standard(monkeypatch):
    """LPFA modules (initial max / residual mean) fused vs standard."""
    from pointcloudattack_tpu.models.curvenet import LPFA

    xyz = jax.random.normal(jax.random.PRNGKey(80), (2, 64, 3)) * 0.5
    feat = jax.random.normal(jax.random.PRNGKey(81), (2, 64, 64)) * 0.5

    for initial in (True, False):
        m = LPFA(64, k=12, mlp_num=2, initial=initial)
        args = (None, xyz) if initial else (feat, xyz)
        v = m.init(jax.random.PRNGKey(82), *args)

        std = m.apply(v, *args, train=False)
        g_std = jax.grad(
            lambda a: m.apply(
                v, *((None, a) if initial else (feat, a)), train=False
            )[:, :, 0].sum()
        )(xyz)
        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
        fused = m.apply(v, *args, train=False)
        g_fused = jax.grad(
            lambda a: m.apply(
                v, *((None, a) if initial else (feat, a)), train=False
            )[:, :, 0].sum()
        )(xyz)
        monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", False)

        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(std), rtol=2e-2, atol=2e-2,
            err_msg=f"initial={initial}",
        )
        gf = np.asarray(g_fused, np.float64)
        gs = np.asarray(g_std, np.float64)
        cos = float(
            (gf * gs).sum()
            / max(np.linalg.norm(gf) * np.linalg.norm(gs), 1e-12)
        )
        assert cos > 0.97, f"initial={initial}: grad cosine {cos}"


def test_curvenet_model_fused_parity(monkeypatch):
    """Whole CurveNet forward with fused LPFA pools vs standard."""
    from pointcloudattack_tpu import models

    m = models.make_model("CurveNet", 8)
    v = models.init_model(m, jax.random.PRNGKey(0), num_points=128, batch=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3)) * 0.5
    lp_std, _ = m.apply(v, x, train=False)
    monkeypatch.setitem(mcommon.FUSED_MAXPOOL, "interpret", True)
    lp_fused, _ = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(lp_fused), np.asarray(lp_std), atol=0.25
    )
    assert (
        np.asarray(jnp.argmax(lp_fused, -1))
        == np.asarray(jnp.argmax(lp_std, -1))
    ).all()
