"""CurveNet: curve-aggregation point-cloud classifier.

TPU-native re-design of reference model/curvenet.py + curvenet_util.py +
walk.py: LPFA embedding, 8 CIC residual blocks (the first four walk curves),
global max+avg pooled head.  Channels-last [B, N, C] throughout.

Key re-design decisions:
  * the guided Walk (reference model/walk.py:74-152) runs its
    ``curve_length`` steps as an unrolled loop with shared weights —
    curve_length is 5 in every shipped config, so unrolling beats a scan
    (XLA fuses each step's gather + MLP + straight-through softmax);
  * the straight-through "gumbel" softmax (reference model/walk.py:17-32 —
    despite the name it adds no gumbel noise) is
    ``stop_grad(onehot(argmax) - softmax) + softmax``;
  * deviation from the reference: walk.py:103-105 reshapes the [B, 2, cn]
    momentum softmax with ``.view(bn, 1, cn, 2)``, scrambling channel and
    curve axes (a latent bug in upstream CurveNet: curve m's two blend
    weights are read from flat positions 2m and 2m+1 of the row-major
    [2, cn] array, so they generally do not even sum to 1).  By default
    we compute the obviously-intended per-curve softmax over the two
    momentum logits.  ``walk_compat=True`` reproduces the reference's
    scrambled view bit-for-bit (used by the reference-code parity tests
    and the torch checkpoint port — no pretrained CurveNet checkpoints
    ship with the reference, but ports of user-trained ones need the
    reference semantics);
  * like the reference (model/curvenet.py:73), the classifier returns RAW
    logits, not log-probs — CW margin losses are monotone-invariant to
    this, but CE-based paths must know (the registry records it).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.ball_query import query_ball_point
from pointcloudattack_tpu.ops.fps import farthest_point_sample
from pointcloudattack_tpu.ops.gather import index_points, index_points_mm_bwd
from pointcloudattack_tpu.ops.knn import knn

CURVE_CONFIG = {
    "default": [[100, 5], [100, 5], None, None],
    "long": [[10, 30], None, None, None],
}


def _dgather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """DIFFERENTIATED neighbour gather (gradient flows into ``points``).

    The round-5 CW-iteration anatomy (BENCH.md "CurveNet anatomy")
    pinned this model's attack cost on the backward: VJP 23.1 ms vs
    forward 6.1 at [8, 1024], i.e. the ~20 scatter-adds XLA emits for
    these gathers' VJPs.  Per the measured per-victim policy
    (models/common.py FUSED_POLICY["curvenet"]["mm_bwd"]) they route
    through the one-hot transpose-matmul VJP instead — forward bitwise
    identical, backward exact up to f32 matmul reduction order.
    Index-only gathers (walk adjacency hops) stay plain
    ``index_points``."""
    from pointcloudattack_tpu.models.common import mm_gather_on

    if mm_gather_on("curvenet"):
        return index_points_mm_bwd(points, idx)
    return index_points(points, idx)


def straight_through_softmax(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Hard one-hot forward, softmax gradients backward."""
    y = jax.nn.softmax(logits, axis=axis)
    hard = jax.nn.one_hot(
        jnp.argmax(y, axis=axis), y.shape[axis], dtype=y.dtype, axis=axis
    )
    return jax.lax.stop_gradient(hard - y) + y


class _BNDense(nn.Module):
    features: int
    use_bias: bool = False
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=self.use_bias)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)
        if self.act:
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class LPFA(nn.Module):
    """Local point-feature aggregation (reference curvenet_util.py:175-236)."""

    out_channel: int
    k: int
    mlp_num: int = 2
    initial: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array | None,
        xyz: jax.Array,
        idx: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        if idx is None:
            idx = knn(xyz, self.k + 1)[:, :, : self.k]

        def _chain_layers():
            layers = []
            for i in range(self.mlp_num):
                pd = self.get_variable("params", f"mlp{i}")
                st = self.get_variable("batch_stats", f"mlp{i}")
                w = pd["Dense_0"]["kernel"]
                mul = jax.lax.rsqrt(
                    st["BatchNorm_0"]["var"] + 1e-5
                ) * pd["BatchNorm_0"]["scale"]
                layers.append((
                    w, jnp.zeros((w.shape[1],), w.dtype),
                    st["BatchNorm_0"]["mean"], mul,
                    pd["BatchNorm_0"]["bias"],
                ))
            return tuple(layers)

        from pointcloudattack_tpu.models.common import (
            FUSED_MAXPOOL,
            fused_gather_on,
        )

        if (
            self.initial
            and not train
            and not self.is_initializing()
            and fused_gather_on("curvenet", xyz.dtype)
        ):
            # in-kernel gather fusion (opt-in) for the INITIAL block:
            # point_feature = [ctr_xyz, nbr_xyz, nbr_xyz - ctr_xyz]
            # (reference curvenet_util.py:203-213) maps onto the layout
            # spec directly, centers = the points themselves.  Residual
            # blocks can't fuse the gather — their row construction
            # runs a learned Dense (xyz2feature) before the chain.
            from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
                gather_chain_groupmax,
                use_gather_chain_kernel,
            )

            layout = (("center", 0, 3), ("pass", 0, 3), ("diff", 0, 3, 0))
            ipg = FUSED_MAXPOOL["interpret"]
            gdims = (9,) + (self.out_channel,) * self.mlp_num
            if ipg or use_gather_chain_kernel(
                xyz.shape[1], self.k, gdims, layout
            ):
                pooled = gather_chain_groupmax(
                    xyz, xyz, idx, _chain_layers(), layout, ipg,
                    slope=0.2,
                )
                return nn.leaky_relu(
                    pooled, negative_slope=0.2
                ).astype(xyz.dtype)

        if (
            not self.initial
            and x is not None
            and not train
            and not self.is_initializing()
            and fused_gather_on("curvenet", xyz.dtype)
        ):
            # RESIDUAL-block gather fusion: the reference rows are
            # leaky_relu((nbr_x - ctr_x) + BN(Dense([ctr, nbr,
            # nbr - ctr] @ W9))) (curvenet_util.py:203-228).  The
            # learned Dense + eval-BN are affine in (nbr_xyz, ctr_xyz),
            # so they FOLD into the gather sources: with W9 split into
            # per-segment 3-row blocks Wc/Wn/Wd and BN folded to
            # (mul, const), rows = act(gather(S) - center(T)) where
            #   S = x + xyz @ ((Wn + Wd) * mul)
            #   T = x - xyz @ ((Wc - Wd) * mul) - const
            # — a single diff-segment layout with a row pre-activation,
            # so the [B, N, k, C] grouped tensor never touches HBM.
            # f32 sum-order deviation only (one 9-wide matmul becomes
            # two 3-wide ones), interpret-exact on CPU; on v5e the
            # deviation compounds across the 9 fused blocks (grad_cos
            # 0.941 measured — tpu_parity_fused.py CurveNet+gather,
            # ADVISORY row).  Ships policy-OFF (XLA also measured
            # faster); PCA_FUSED_GATHER=1 force-enables.
            from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
                gather_chain_groupmean,
                use_gather_chain_kernel,
            )

            c = x.shape[-1]
            layout = (("diff", 0, c, 0),)
            ipg = FUSED_MAXPOOL["interpret"]
            gdims = (c,) + (self.out_channel,) * self.mlp_num
            if ipg or use_gather_chain_kernel(
                xyz.shape[1], self.k, gdims, layout
            ):
                w9 = self.get_variable("params", "xyz2feature")["kernel"]
                pb = self.get_variable("params", "xyz2feature_bn")
                st = self.get_variable("batch_stats", "xyz2feature_bn")
                mul = jax.lax.rsqrt(st["var"] + 1e-5) * pb["scale"]
                const = pb["bias"] - st["mean"] * mul
                a_n = (w9[3:6] + w9[6:9]) * mul[None, :]
                a_c = (w9[0:3] - w9[6:9]) * mul[None, :]
                f32 = jnp.float32
                src = x.astype(f32) + xyz.astype(f32) @ a_n.astype(f32)
                ctrs = (
                    x.astype(f32)
                    - xyz.astype(f32) @ a_c.astype(f32)
                    - const.astype(f32)[None, None, :]
                )
                pooled = gather_chain_groupmean(
                    src.astype(xyz.dtype), ctrs.astype(xyz.dtype), idx,
                    _chain_layers(), layout, ipg, slope=0.2,
                    pre_act=True,
                )
                return pooled.astype(xyz.dtype)

        nbr_xyz = _dgather(xyz, idx)  # [B, N, k, 3]
        ctr_xyz = jnp.broadcast_to(xyz[:, :, None, :], nbr_xyz.shape)
        point_feature = jnp.concatenate(
            [ctr_xyz, nbr_xyz, nbr_xyz - ctr_xyz], axis=-1
        )  # [B, N, k, 9]

        if self.initial:
            h = point_feature
        else:
            nbr_x = _dgather(x, idx)  # [B, N, k, C]
            diff = nbr_x - x[:, :, None, :]
            pf = nn.Dense(x.shape[-1], use_bias=False, name="xyz2feature")(
                point_feature
            )
            pf = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="xyz2feature_bn",
            )(pf)
            h = nn.leaky_relu(diff + pf, negative_slope=0.2)

        # fused chain + pool over k (Pallas, eval on TPU): the
        # [B, N, k, out_channel] MLP maps stay VMEM-resident.  The
        # initial block max-pools (LeakyReLU commutes, applied after);
        # the residual blocks MEAN-pool with the activation inside.
        from pointcloudattack_tpu.models.common import (
            FUSED_MAXPOOL,
            fused_chain_on,
        )
        from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
            mlp_chain_groupmax,
            mlp_chain_groupmean,
            use_group_chain_kernel,
        )

        ip = FUSED_MAXPOOL["interpret"]
        dims = (h.shape[-1],) + (self.out_channel,) * self.mlp_num
        if (
            not train
            and not self.is_initializing()
            and fused_chain_on("curvenet", h.dtype)
            and (ip or use_group_chain_kernel(self.k, dims))
        ):
            layers = _chain_layers()
            if self.initial:
                pooled = mlp_chain_groupmax(
                    h, tuple(layers), ip, 0.2
                )
                return nn.leaky_relu(
                    pooled, negative_slope=0.2
                ).astype(h.dtype)
            return mlp_chain_groupmean(
                h, tuple(layers), ip, 0.2
            ).astype(h.dtype)

        for i in range(self.mlp_num):
            h = _BNDense(self.out_channel, name=f"mlp{i}")(h, train=train)

        if self.initial:
            return jnp.max(h, axis=2)
        return jnp.mean(h, axis=2)


class Walk(nn.Module):
    """Guided walk on the kNN graph producing curve features.

    Reference model/walk.py:35-152.  Returns [B, curve_num, curve_len, C].
    """

    k: int
    curve_num: int
    curve_length: int
    momentum_compat: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        x: jax.Array,
        adj: jax.Array,
        start: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        # x: [B, N, C]; adj: [B, N, k] (self-loop removed); start: [B, cn]
        c = x.shape[-1]
        agent = _BNDense(1, act=False, name="agent_mlp")
        momentum = _BNDense(2, act=False, name="momentum_mlp")

        cur_idx = start  # [B, cn]
        pre_feature = _dgather(x, cur_idx)  # [B, cn, C]
        cur_feature = None
        steps = []

        for step in range(self.curve_length):
            if step > 0:
                # dynamic momentum blend of current point and curve state
                cat = jnp.concatenate([cur_feature, pre_feature], axis=-1)
                att = jax.nn.softmax(momentum(cat, train=train), axis=-1)
                if self.momentum_compat:
                    # reference walk.py:103-105: the [bn, 2, cn] softmax
                    # is `.view(bn, 1, cn, 2)`-ed, so curve m reads its
                    # two weights from flat (channel, curve) positions
                    # 2m and 2m+1 — reproduce that row-major reindex
                    att = jnp.swapaxes(att, 1, 2).reshape(
                        att.shape[0], self.curve_num, 2
                    )
                pre_feature = (
                    att[..., 0:1] * cur_feature + att[..., 1:2] * pre_feature
                )

            pick_idx = index_points(adj, cur_idx)  # [B, cn, k] neighbour ids
            pick_values = _dgather(x, pick_idx.reshape(x.shape[0], -1))
            pick_values = pick_values.reshape(
                x.shape[0], self.curve_num, self.k, c
            )

            pre_exp = jnp.broadcast_to(
                pre_feature[:, :, None, :], pick_values.shape
            )
            score = agent(
                jnp.concatenate([pick_values, pre_exp], axis=-1), train=train
            )[..., 0]  # [B, cn, k]

            if step > 0:
                # crossover suppression: damp neighbours whose direction
                # opposes the walk's momentum (reference walk.py:57-72)
                v_walk = jax.lax.stop_gradient(cur_feature - pre_feature)
                v_next = jax.lax.stop_gradient(
                    pick_values - cur_feature[:, :, None, :]
                )
                dot = jnp.sum(v_walk[:, :, None, :] * v_next, axis=-1)
                denom = jnp.maximum(
                    jnp.linalg.norm(v_walk, axis=-1)[:, :, None]
                    * jnp.linalg.norm(v_next, axis=-1),
                    1e-8,
                )
                d = jnp.clip(1.0 + dot / denom, 0.0, 1.0)
                score = score * jax.lax.stop_gradient(d)

            w = straight_through_softmax(score, axis=-1)  # [B, cn, k]
            cur_feature = jnp.sum(pick_values * w[..., None], axis=2)
            choice = jnp.argmax(w, axis=-1)  # [B, cn]
            cur_idx = jnp.take_along_axis(
                pick_idx, choice[..., None], axis=-1
            )[..., 0]
            steps.append(cur_feature)

        return jnp.stack(steps, axis=2)  # [B, cn, cl, C]


class CurveAggregation(nn.Module):
    """Inter/intra-curve attention feature update.

    Reference curvenet_util.py:379-437.  x: [B, N, C],
    curves: [B, cn, cl, C] -> [B, N, C].
    """

    @nn.compact
    def __call__(self, x: jax.Array, curves: jax.Array, train: bool = False):
        c = x.shape[-1]
        mid = c // 2
        att = nn.Dense(1, use_bias=False, name="line_conv_att")(curves)
        # [B, cn, cl, 1]
        inter = jnp.sum(
            curves * jax.nn.softmax(att, axis=2), axis=2
        )  # [B, cn, C]
        intra = jnp.sum(
            curves * jax.nn.softmax(att, axis=1), axis=1
        )  # [B, cl, C]

        inter_a = nn.Dense(mid, use_bias=False, name="conva")(inter)
        intra_b = nn.Dense(mid, use_bias=False, name="convb")(intra)
        xl = nn.Dense(mid, use_bias=False, name="convc")(x)  # [B, N, mid]

        w_inter = jax.nn.softmax(
            jnp.einsum("bnm,bcm->bnc", xl, inter_a), axis=-1
        )  # [B, N, cn]
        w_intra = jax.nn.softmax(
            jnp.einsum("bnm,blm->bnl", xl, intra_b), axis=-1
        )  # [B, N, cl]

        inter_n = nn.Dense(mid, use_bias=False, name="convn")(inter_a)
        intra_l = nn.Dense(mid, use_bias=False, name="convl")(intra_b)

        f_inter = jnp.einsum("bnc,bcm->bnm", w_inter, inter_n)
        f_intra = jnp.einsum("bnl,blm->bnm", w_intra, intra_l)

        feats = jnp.concatenate([f_inter, f_intra], axis=-1)  # [B, N, 2mid]
        upd = nn.Dense(c, use_bias=False, name="convd")(feats)
        upd = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="convd_bn",
        )(upd)
        return nn.leaky_relu(x + upd, negative_slope=0.2)


class CurveGrouping(nn.Module):
    """Pick curve start points by sigmoid attention and walk.

    Reference curvenet_util.py:440-466.
    """

    k: int
    curve_num: int
    curve_length: int
    momentum_compat: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, xyz: jax.Array, adj: jax.Array, train: bool = False
    ):
        att = jax.nn.sigmoid(
            nn.Dense(1, use_bias=False, name="att")(x)
        )  # [B, N, 1]
        x = x * att
        _, start = jax.lax.top_k(att[..., 0], self.curve_num)  # [B, cn]
        return Walk(
            self.k,
            self.curve_num,
            self.curve_length,
            momentum_compat=self.momentum_compat,
            name="walk",
        )(xyz, x, adj, start, train=train)


class MaskedMaxPool(nn.Module):
    """FPS + ball query + feature max-pool (reference curvenet_util.py:469-485)."""

    npoint: int
    radius: float
    k: int

    @nn.compact
    def __call__(self, xyz: jax.Array, feats: jax.Array):
        fps_idx = farthest_point_sample(xyz, self.npoint, key=None)
        new_xyz = _dgather(xyz, fps_idx)
        idx = query_ball_point(self.radius, self.k, xyz, new_xyz)
        grouped = _dgather(feats, idx)  # [B, S, k, C]
        return new_xyz, jnp.max(grouped, axis=2)


class CIC(nn.Module):
    """Curve-intervention-convolution residual block.

    Reference curvenet_util.py:303-376.
    """

    npoint: int
    radius: float
    k: int
    in_channels: int
    output_channels: int
    bottleneck_ratio: int = 2
    mlp_num: int = 2
    curve_cfg: Sequence[int] | None = None
    momentum_compat: bool = False

    @nn.compact
    def __call__(self, xyz: jax.Array, x: jax.Array, train: bool = False):
        if xyz.shape[1] != self.npoint:
            xyz, x = MaskedMaxPool(
                self.npoint, self.radius, self.k, name="maxpool"
            )(xyz, x)

        shortcut = x
        planes = self.in_channels // self.bottleneck_ratio
        h = _BNDense(planes, name="conv1")(x, train=train)

        idx = knn(xyz, self.k + 1)  # [B, N, k+1], self first

        if self.curve_cfg is not None:
            curves = CurveGrouping(
                self.k,
                self.curve_cfg[0],
                self.curve_cfg[1],
                momentum_compat=self.momentum_compat,
                name="curvegrouping",
            )(h, xyz, idx[:, :, 1:], train=train)
            h = CurveAggregation(name="curveaggregation")(
                h, curves, train=train
            )

        h = LPFA(planes, self.k, mlp_num=self.mlp_num, name="lpfa")(
            h, xyz, idx=idx[:, :, : self.k], train=train
        )

        h = _BNDense(self.output_channels, act=False, name="conv2")(
            h, train=train
        )
        if self.in_channels != self.output_channels:
            shortcut = _BNDense(
                self.output_channels, act=False, name="shortcut"
            )(shortcut, train=train)
        return xyz, nn.leaky_relu(h + shortcut, negative_slope=0.2)


class CurveNet(nn.Module):
    """CurveNet classifier (reference model/curvenet.py:11-73).

    Returns (raw logits, aux) — NOT log-probs, matching the reference.

    ``walk_compat=True`` reproduces the reference Walk's scrambled
    momentum view (model/walk.py:103-105) exactly — used for parity
    tests and checkpoint ports; see the module docstring.
    """

    num_classes: int = 40
    k: int = 20
    setting: str = "default"
    walk_compat: bool = False

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False):
        cfg = CURVE_CONFIG[self.setting]
        l0 = LPFA(32, k=self.k, mlp_num=1, initial=True, name="lpfa")(
            None, xyz, train=train
        )

        x1, h = CIC(1024, 0.05, self.k, 32, 64, 2, 1, cfg[0], momentum_compat=self.walk_compat, name="cic11")(
            xyz, l0, train=train
        )
        x1, h = CIC(1024, 0.05, self.k, 64, 64, 4, 1, cfg[0], momentum_compat=self.walk_compat, name="cic12")(
            x1, h, train=train
        )
        x2, h = CIC(1024, 0.05, self.k, 64, 128, 2, 1, cfg[1], momentum_compat=self.walk_compat, name="cic21")(
            x1, h, train=train
        )
        x2, h = CIC(1024, 0.1, self.k, 128, 128, 4, 1, cfg[1], momentum_compat=self.walk_compat, name="cic22")(
            x2, h, train=train
        )
        x3, h = CIC(256, 0.1, self.k, 128, 256, 2, 1, cfg[2], momentum_compat=self.walk_compat, name="cic31")(
            x2, h, train=train
        )
        x3, h = CIC(256, 0.2, self.k, 256, 256, 4, 1, cfg[2], momentum_compat=self.walk_compat, name="cic32")(
            x3, h, train=train
        )
        x4, h = CIC(64, 0.2, self.k, 256, 512, 2, 1, cfg[3], momentum_compat=self.walk_compat, name="cic41")(
            x3, h, train=train
        )
        x4, h = CIC(64, 0.4, self.k, 512, 512, 4, 1, cfg[3], momentum_compat=self.walk_compat, name="cic42")(
            x4, h, train=train
        )

        # conv0 uses plain ReLU in the reference (curvenet.py:41-44)
        h = nn.Dense(1024, use_bias=False, name="conv0")(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn0",
        )(h)
        h = nn.relu(h)  # [B, 64, 1024]
        g = jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], -1)
        g = nn.Dense(512, use_bias=False, name="conv1")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn1",
        )(g)
        g = nn.relu(g)
        g = nn.Dropout(0.5, deterministic=not train)(g)
        logits = nn.Dense(self.num_classes, name="conv2")(g)
        return logits, {}
