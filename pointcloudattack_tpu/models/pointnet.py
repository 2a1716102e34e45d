"""PointNet classifier with spatial transformer(s).

TPU-native re-design of reference model/pointnet.py: channels-last layout,
per-point MLPs as MXU matmuls, global max pool over the point axis.
Architecture parity:
  * STN3d / STNkd      -> reference model/pointnet.py:14-87
  * PointNetFeat       -> reference model/pointnet.py:89-128
  * PointNetCls        -> reference model/pointnet.py:130-148
  * PointNetDenseCls   -> reference model/pointnet.py:151-176
Dropout(p=0.3) between fc2 and bn2 matches reference :138,146 (only active
in training; attacks run eval mode).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.models.common import (
    FUSED_MAXPOOL,
    PointMLP,
    fused_chain_on,
)
from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
    mlp_chain_maxpool,
    use_chain_kernel,
)


class STN(nn.Module):
    """Spatial transformer predicting a k x k alignment matrix."""

    k: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, N, k] — the 128->1024 tail + max pool runs fused on TPU
        # (ops/pallas/dense_max_kernel.py; relu commutes with max)
        h = PointMLP(
            [64, 128, 1024], pool_max=True, family="pointnet", name="mlp"
        )(
            x, train=train
        )  # [B, 1024]
        h = PointMLP([512, 256], name="fc")(h, train=train)
        mat = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="out",
        )(h)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(1, self.k * self.k)
        return (mat + eye).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """Global (and optionally per-point) PointNet feature extractor."""

    global_feat: bool = True
    feature_transform: bool = False

    def _pml_layer(self, name: str):
        """(w, b, mean, mul, beta) of a single-layer child PointMLP."""
        pd = self.get_variable("params", name)
        pb = pd["bn0"]
        st = self.get_variable("batch_stats", name)["bn0"]
        mul = jax.lax.rsqrt(st["var"] + 1e-5) * pb["scale"]
        return (
            pd["dense0"]["kernel"], pd["dense0"]["bias"], st["mean"],
            mul, pb["bias"],
        )

    def _fusable(self, train: bool, dtype) -> bool:
        return (
            not train
            and not self.is_initializing()
            and self.global_feat  # seg head needs per-point mlp1 output
            and fused_chain_on("pointnet", dtype)
        )

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        # x: [B, N, 3]
        trans = STN(k=3, name="stn")(x, train=train)
        x = jnp.einsum(
            "bnc,bck->bnk", x, trans, precision=jax.lax.Precision.HIGHEST
        )
        n = x.shape[1]
        ip = FUSED_MAXPOOL["interpret"]

        # Cross-module fusion: with no feature transform, the whole
        # mlp1 -> mlp2 -> mlp3 -> max spine runs as ONE Pallas pass
        # (ops/pallas/dense_max_kernel.py) — none of the [B, N, 64/128/
        # 1024] maps of reference model/pointnet.py:104-121 touch HBM.
        if (
            not self.feature_transform
            and self._fusable(train, x.dtype)
            and (ip or use_chain_kernel(n, (x.shape[-1], 64, 128, 1024)))
        ):
            layers = tuple(
                self._pml_layer(name) for name in ("mlp1", "mlp2", "mlp3")
            )
            gf = mlp_chain_maxpool(x, layers, ip).astype(x.dtype)
            return gf, trans, None

        x = PointMLP([64], name="mlp1")(x, train=train)

        if self.feature_transform:
            trans_feat = STN(k=64, name="fstn")(x, train=train)
            x = jnp.einsum(
                "bnc,bck->bnk",
                x,
                trans_feat,
                precision=jax.lax.Precision.HIGHEST,
            )
            # the mlp2 -> mlp3 -> max tail still fuses (L=2 chain)
            if self._fusable(train, x.dtype) and (
                ip or use_chain_kernel(n, (x.shape[-1], 128, 1024))
            ):
                layers = (
                    self._pml_layer("mlp2"), self._pml_layer("mlp3"),
                )
                gf = mlp_chain_maxpool(x, layers, ip).astype(x.dtype)
                return gf, trans, trans_feat
        else:
            trans_feat = None

        point_feat = x  # [B, N, 64]
        x = PointMLP([128], name="mlp2")(x, train=train)
        gf = PointMLP(
            [1024], relu_last=False, pool_max=True, family="pointnet",
            name="mlp3",
        )(x, train=train)  # [B, 1024] (fused Dense+BN+max on TPU)
        if self.global_feat:
            return gf, trans, trans_feat
        n = point_feat.shape[1]
        tiled = jnp.repeat(gf[:, None, :], n, axis=1)
        return (
            jnp.concatenate([tiled, point_feat], axis=-1),
            trans,
            trans_feat,
        )


class PointNetCls(nn.Module):
    """PointNet classification head. Returns (log_probs, aux)."""

    num_classes: int = 2
    feature_transform: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        feat, trans, trans_feat = PointNetFeat(
            global_feat=True,
            feature_transform=self.feature_transform,
            name="feat",
        )(x, train=train)
        h = PointMLP([512], name="fc1")(feat, train=train)
        h = nn.Dense(256, name="fc2")(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn2",
        )(h)
        h = nn.relu(h)
        logits = nn.Dense(self.num_classes, name="fc3")(h)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, {"trans": trans, "trans_feat": trans_feat}


class PointNetDenseCls(nn.Module):
    """Per-point segmentation head. Returns (log_probs [B,N,k], aux)."""

    num_classes: int = 2
    feature_transform: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        feat, trans, trans_feat = PointNetFeat(
            global_feat=False,
            feature_transform=self.feature_transform,
            name="feat",
        )(x, train=train)  # [B, N, 1088]
        h = PointMLP([512, 256, 128], name="mlp")(feat, train=train)
        logits = nn.Dense(self.num_classes, name="out")(h)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, {"trans": trans, "trans_feat": trans_feat}
