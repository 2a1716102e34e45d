"""PU-Net point-cloud upsampler (CVPR'18), used by the DUP-Net defense.

TPU-native re-design of reference
attack/SIadv/baselines/defense/DUP_Net/pu_net.py:8-131: four set-
abstraction levels (npoint, npoint/2, /4, /8), three feature-propagation
upsamplers back to the input resolution, ``up_ratio`` parallel expansion
MLPs concatenated along the point axis, and a coordinate-reconstruction
head.  Defaults match the DUP-Net config (npoint=1024, up_ratio=4,
no BN — reference DUP_Net.py:14-34 and pu_net.py use_bn=False).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.grouping import sample_and_group
from pointcloudattack_tpu.ops.interpolate import three_nn_interpolate


class _MLP(nn.Module):
    """SharedMLP without BN (pu_net defaults), ReLU activations."""

    features: Sequence[int]
    last_act: bool = True

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense{i}")(x)
            if self.last_act or i < len(self.features) - 1:
                x = nn.relu(x)
        return x


class PUNetSA(nn.Module):
    """PU-Net set abstraction: FPS -> ball group (use_xyz) -> MLP -> max.

    The grouping (relative xyz first, then features) is exactly
    ops.grouping.sample_and_group's contract.
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, feats):
        from pointcloudattack_tpu.models.common import (
            FUSED_MAXPOOL,
            fused_chain_on,
            fused_gather_on,
        )
        from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
            mlp_chain_groupmax,
            use_group_chain_kernel,
        )

        ip = FUSED_MAXPOOL["interpret"]
        if (
            not self.is_initializing()
            and fused_gather_on("punet", xyz.dtype)
        ):
            # in-kernel gather fusion (opt-in, PCA_FUSED_GATHER): same
            # construction as sample_and_group, gather done in VMEM
            from pointcloudattack_tpu.ops.ball_query import (
                query_ball_point,
            )
            from pointcloudattack_tpu.ops.fps import farthest_point_sample
            from pointcloudattack_tpu.ops.gather import index_points
            from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
                gather_chain_groupmax,
                use_gather_chain_kernel,
            )

            if feats is not None:
                src = jnp.concatenate([xyz, feats], axis=-1)
                layout = (("diff", 0, 3, 0), ("pass", 3, src.shape[-1]))
            else:
                src, layout = xyz, (("diff", 0, 3, 0),)
            c0 = sum(s[2] - s[1] for s in layout)
            if ip or use_gather_chain_kernel(
                src.shape[1], self.nsample, (c0, *self.mlp), layout
            ):
                fps_idx = farthest_point_sample(xyz, self.npoint, key=None)
                new_xyz = index_points(xyz, fps_idx)
                idx = query_ball_point(
                    self.radius, self.nsample, xyz, new_xyz
                )
                pd = self.get_variable("params", "mlp")
                layers = []
                for i in range(len(self.mlp)):
                    w = pd[f"dense{i}"]["kernel"]
                    zero = jnp.zeros((w.shape[1],), w.dtype)
                    one = jnp.ones((w.shape[1],), w.dtype)
                    layers.append(
                        (w, pd[f"dense{i}"]["bias"], zero, one, zero)
                    )
                pooled = gather_chain_groupmax(
                    src, new_xyz, idx, tuple(layers), layout, ip
                )
                return new_xyz, nn.relu(pooled).astype(src.dtype)

        new_xyz, grouped = sample_and_group(
            self.npoint, self.radius, self.nsample, xyz, feats, key=None
        )
        if (
            not self.is_initializing()
            and fused_chain_on("punet", grouped.dtype)
            and (
                ip
                or use_group_chain_kernel(
                    self.nsample, (grouped.shape[-1], *self.mlp)
                )
            )
        ):
            # fused chain+max-over-nsample Pallas pass (identity BN
            # vectors — pu_net runs use_bn=False); the trailing ReLU
            # commutes with the max and runs on the pooled output.
            # Hot in --defense dupnet query loops (one PU-Net forward
            # per query, reference DUP_Net.py:24-34).
            pd = self.get_variable("params", "mlp")
            layers = []
            for i in range(len(self.mlp)):
                w = pd[f"dense{i}"]["kernel"]
                zero = jnp.zeros((w.shape[1],), w.dtype)
                one = jnp.ones((w.shape[1],), w.dtype)
                layers.append(
                    (w, pd[f"dense{i}"]["bias"], zero, one, zero)
                )
            pooled = mlp_chain_groupmax(grouped, tuple(layers), ip)
            return new_xyz, nn.relu(pooled).astype(grouped.dtype)
        h = _MLP(self.mlp, name="mlp")(grouped)
        return new_xyz, jnp.max(h, axis=2)


class PUNet(nn.Module):
    """Upsamples [B, npoint, 3] -> [B, npoint * up_ratio, 3]."""

    npoint: int = 1024
    up_ratio: int = 4

    @nn.compact
    def __call__(self, points):
        xyz = points[..., :3]
        npoints = [
            self.npoint,
            self.npoint // 2,
            self.npoint // 4,
            self.npoint // 8,
        ]
        mlps = [[32, 32, 64], [64, 64, 128], [128, 128, 256], [256, 256, 512]]
        radii = [0.05, 0.1, 0.2, 0.3]

        l_xyz, l_feats = [xyz], [None]
        for k in range(4):
            lx, lf = PUNetSA(
                npoints[k], radii[k], 32, mlps[k], name=f"sa{k}"
            )(l_xyz[k], l_feats[k])
            l_xyz.append(lx)
            l_feats.append(lf)

        # upsample levels 2..4 back to the input resolution
        up_feats = []
        for k in range(3):
            interp = three_nn_interpolate(
                xyz, l_xyz[k + 2], l_feats[k + 2]
            )
            up_feats.append(_MLP([64], name=f"fp{k}")(interp))

        feats = jnp.concatenate([xyz, l_feats[1], *up_feats], axis=-1)

        # expansion: up_ratio branches concatenated along the point axis
        r_feats = [
            _MLP([256, 128], name=f"expand{k}")(feats)
            for k in range(self.up_ratio)
        ]
        r = jnp.concatenate(r_feats, axis=1)  # [B, r*N, 128]

        h = _MLP([64], name="recon0")(r)
        out = nn.Dense(3, name="recon1")(h)
        return out
