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


def test_param_gradients_match_oracle():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 256, 64))
    args = _params(key, 64, 512)

    def loss(fn, *p):
        return jnp.sum(fn(x, *p) ** 2)

    gk = jax.grad(
        lambda *p: loss(
            functools.partial(
                lambda *a: dense_bn_maxpool(*a, True)
            ), *p
        ),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    go = jax.grad(
        lambda *p: loss(_bf16_oracle, *p), argnums=(0, 1, 2, 3, 4)
    )(*args)
    # the kernel's dw uses the EXACT f32 winning rows; the oracle
    # autodiffs through bf16-truncated x — elementwise comparison is
    # dominated by that truncation, so check relative Frobenius error
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
        monkeypatch.setattr(mcommon, "dense_bn_maxpool", boom)
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
        monkeypatch.setattr(mcommon, "dense_bn_maxpool", boom)
        lp, _ = m.apply(v, x, train=False)
        assert lp.shape == (2, 8)
