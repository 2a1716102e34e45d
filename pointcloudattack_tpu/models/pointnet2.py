"""PointNet++ SSG / MSG classifiers.

TPU-native re-design of reference model/pointnet2_SSG.py:230-254 and
model/pointnet2_MSG.py:194-227 on top of the ops layer: FPS is a lax.scan,
ball query and grouping are fully batched gathers, and each set-abstraction
MLP is an MXU matmul over the [B, S, nsample, C] grouped tensor.

FPS seeding: the reference randomizes the FPS start point every forward
(model/pointnet2_utils.py:72).  Here the start index comes from an optional
``fps_key``; None pins it to point 0 for deterministic eval/attack runs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.models.common import (
    FUSED_MAXPOOL,
    PointMLP,
    fused_ballq_on,
    fused_chain_on,
    fused_gather_on,
)
from pointcloudattack_tpu.ops.ball_query import query_ball_point
from pointcloudattack_tpu.ops.fps import farthest_point_sample
from pointcloudattack_tpu.ops.gather import index_points
from pointcloudattack_tpu.ops.grouping import (
    sample_and_group,
    sample_and_group_all,
)


def _collect_layers(parent: nn.Module, name: str, n: int):
    """(w, b, mean, mul, beta) per layer of a PointMLP submodule."""
    pd = parent.get_variable("params", name)
    st = parent.get_variable("batch_stats", name)
    layers = []
    for i in range(n):
        mul = jax.lax.rsqrt(st[f"bn{i}"]["var"] + 1e-5) * pd[f"bn{i}"]["scale"]
        layers.append((
            pd[f"dense{i}"]["kernel"], pd[f"dense{i}"]["bias"],
            st[f"bn{i}"]["mean"], mul, pd[f"bn{i}"]["bias"],
        ))
    return tuple(layers)


def _fused_gather_sa(
    parent: nn.Module, name: str, feats, src, layout, nsample, train,
    sample_fn, family: str = "ssg",
):
    """Set abstraction with IN-KERNEL neighbour gather: the grouped
    [B, S, K, C] tensor is never materialized — the kernel gathers from
    ``src`` (3-limb exact for diffed xyz, chain-truncation-identical
    bf16 for features), builds the rows in VMEM, runs the MLP chain and
    the max (ops/pallas/gather_chain_kernel.py).  Returns
    (centers, pooled [B, S, C_L] post-ReLU) or None when ineligible.
    Per-family policy via fused_gather_on (PCA_FUSED_GATHER overrides).

    Every eligibility gate is STATIC (shapes + flags) and evaluated
    before ``sample_fn() -> (centers, idx)`` runs, so a refused fused
    path costs no duplicate FPS/ball-query work.
    """
    from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
        gather_chain_groupmax,
        use_gather_chain_kernel,
    )

    if (
        train
        or parent.is_initializing()
        or not fused_gather_on(family, src.dtype)
    ):
        return None
    ip = FUSED_MAXPOOL["interpret"]
    c0 = sum(s[2] - s[1] for s in layout)
    dims = (c0, *feats)
    if not (
        ip
        or use_gather_chain_kernel(src.shape[1], nsample, dims, layout)
    ):
        return None
    centers, idx = sample_fn()
    layers = _collect_layers(parent, name, len(feats))
    pooled = gather_chain_groupmax(src, centers, idx, layers, layout, ip)
    return centers, nn.relu(pooled).astype(src.dtype)


def _ball_fused_ok(
    parent: nn.Module, family, src, layout, nsample, feats, train
) -> bool:
    """Static gate for the ball-query-in-kernel SA path (round-5
    verdict task 3): per-family policy (fused_ballq_on, which itself
    requires the gather tier) + the kernel's shape bounds."""
    from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
        use_ball_gather_chain_kernel,
    )

    if (
        train
        or parent.is_initializing()
        or not fused_ballq_on(family, src.dtype)
    ):
        return False
    c0 = sum(s[2] - s[1] for s in layout)
    return FUSED_MAXPOOL["interpret"] or use_ball_gather_chain_kernel(
        src.shape[1], nsample, (c0, *feats), layout
    )


def _ball_fused_sa(
    parent: nn.Module, name, feats, src, layout, xyz, new_xyz,
    radius, nsample,
):
    """SA through ball_gather_chain_groupmax: neither the ball-query
    one-hot nor the index array exists — membership is recomputed
    in-VMEM (reference model/pointnet2_utils.py:84-155)."""
    from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
        ball_gather_chain_groupmax,
    )

    layers = _collect_layers(parent, name, len(feats))
    pooled = ball_gather_chain_groupmax(
        src, new_xyz, xyz, layers, layout, radius, nsample,
        FUSED_MAXPOOL["interpret"],
    )
    return nn.relu(pooled).astype(src.dtype)


def _fused_group_mlp(
    parent: nn.Module, name: str, feats, grouped, train,
    family: str = "ssg",
):
    """Run a grouped PointMLP + max-over-K, fused when eligible.

    Returns the pooled [B, S, C_L] (post-ReLU — SA stacks end in ReLU,
    which commutes with max) or None to use the standard path.  The
    fused pass (ops/pallas/dense_max_kernel.py::mlp_chain_groupmax)
    keeps every [B, S, K, C] layer map VMEM-resident.
    """
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        mlp_chain_groupmax,
        use_group_chain_kernel,
    )

    if (
        train
        or parent.is_initializing()
        or not fused_chain_on(family, grouped.dtype)
    ):
        return None
    ip = FUSED_MAXPOOL["interpret"]
    k = grouped.shape[2]
    dims = (grouped.shape[-1], *feats)
    if not (ip or use_group_chain_kernel(k, dims)):
        return None
    layers = _collect_layers(parent, name, len(feats))
    pooled = mlp_chain_groupmax(grouped, layers, ip)
    return nn.relu(pooled).astype(grouped.dtype)


class SetAbstraction(nn.Module):
    """Single-scale set abstraction: FPS -> ball group -> MLP -> max."""

    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: Sequence[int]
    group_all: bool = False
    # owning model family for the per-victim fused-kernel policy
    family: str = "ssg"

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: jax.Array | None,
        train: bool = False,
        fps_key: jax.Array | None = None,
    ):
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
            # the single "group" is the whole cloud (K > the grouped
            # kernel's 512-segment limit): squeeze to [B, K, C] and run
            # as a dense chain, which PointMLP(pool_max) fuses into one
            # chain+maxpool Pallas pass on TPU.  relu-after-max ==
            # max-after-relu (monotone), so this is bit-identical to the
            # grouped path it replaces.
            pooled = PointMLP(
                self.mlp, pool_max=True, family=self.family, name="mlp"
            )(grouped[:, 0], train=train)[:, None]
            return new_xyz, pooled
        if fused_gather_on(self.family, xyz.dtype):
            # in-kernel gather fusion (per-family policy): reproduce
            # sample_and_group's exact construction (ops/grouping.py:
            # 39-48 — grouped_xyz - new_xyz first, features after) with
            # the gather inside the kernel; FPS/ball-query only run
            # once the static gates have accepted
            if points is not None:
                src = jnp.concatenate([xyz, points], axis=-1)
                layout = (
                    ("diff", 0, 3, 0), ("pass", 3, src.shape[-1]),
                )
            else:
                src, layout = xyz, (("diff", 0, 3, 0),)

            if _ball_fused_ok(
                self, self.family, src, layout, self.nsample, self.mlp,
                train,
            ):
                fps_idx = farthest_point_sample(
                    xyz, self.npoint, key=fps_key
                )
                new_xyz = index_points(xyz, fps_idx)
                pooled = _ball_fused_sa(
                    self, "mlp", self.mlp, src, layout, xyz, new_xyz,
                    self.radius, self.nsample,
                )
                return new_xyz, pooled

            def sample_fn():
                fps_idx = farthest_point_sample(
                    xyz, self.npoint, key=fps_key
                )
                new_xyz = index_points(xyz, fps_idx)
                idx = query_ball_point(
                    self.radius, self.nsample, xyz, new_xyz
                )
                return new_xyz, idx

            res = _fused_gather_sa(
                self, "mlp", self.mlp, src, layout, self.nsample, train,
                sample_fn, family=self.family,
            )
            if res is not None:
                return res
        new_xyz, grouped = sample_and_group(
            self.npoint, self.radius, self.nsample, xyz, points,
            key=fps_key,
        )
        # grouped: [B, S, K, C] -> per-point MLP -> max over K (fused
        # chain+pool Pallas pass on TPU in eval mode)
        pooled = _fused_group_mlp(
            self, "mlp", self.mlp, grouped, train, family=self.family
        )
        if pooled is None:
            h = PointMLP(self.mlp, name="mlp")(grouped, train=train)
            pooled = jnp.max(h, axis=2)
        return new_xyz, pooled


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping set abstraction."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    family: str = "msg"

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: jax.Array | None,
        train: bool = False,
        fps_key: jax.Array | None = None,
    ):
        fps_idx = farthest_point_sample(xyz, self.npoint, key=fps_key)
        new_xyz = index_points(xyz, fps_idx)
        # reference concatenates FEATURES first, xyz-diff last
        # (model/pointnet2_MSG.py:45-52)
        if points is not None:
            src = jnp.concatenate([xyz, points], axis=-1)
            layout = (("pass", 3, src.shape[-1]), ("diff", 0, 3, 0))
        else:
            src, layout = xyz, (("diff", 0, 3, 0),)
        # one HIGHEST-precision distance matmul shared by every radius
        # scale (the reference recomputes it inside each query_ball_point,
        # model/pointnet2_MSG.py:31-41 via pointnet2_utils.py:84-104) —
        # computed lazily: scales on the ball-fused path (membership
        # recomputed in-VMEM) never need it
        from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist

        sqr_cache = []

        def _sqr():
            if not sqr_cache:
                sqr_cache.append(pairwise_sqdist(new_xyz, xyz))
            return sqr_cache[0]

        outs = []
        for i, (radius, k) in enumerate(
            zip(self.radius_list, self.nsample_list)
        ):
            if _ball_fused_ok(
                self, self.family, src, layout, k, self.mlp_list[i],
                train,
            ):
                outs.append(_ball_fused_sa(
                    self, f"branch{i}", self.mlp_list[i], src, layout,
                    xyz, new_xyz, radius, k,
                ))
                continue
            idx = query_ball_point(radius, k, xyz, new_xyz, sqr=_sqr())
            if fused_gather_on(self.family, xyz.dtype):
                # new_xyz/idx are already computed (shared across
                # scales), so the sample_fn is free
                res = _fused_gather_sa(
                    self, f"branch{i}", self.mlp_list[i], src, layout,
                    k, train, lambda: (new_xyz, idx),
                    family=self.family,
                )
                if res is not None:
                    outs.append(res[1])
                    continue
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped_pts = index_points(points, idx)
                grouped = jnp.concatenate(
                    [grouped_pts, grouped_xyz], axis=-1
                )
            else:
                grouped = grouped_xyz
            pooled = _fused_group_mlp(
                self, f"branch{i}", self.mlp_list[i], grouped, train,
                family=self.family,
            )
            if pooled is None:
                h = PointMLP(self.mlp_list[i], name=f"branch{i}")(
                    grouped, train=train
                )
                pooled = jnp.max(h, axis=2)
            outs.append(pooled)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + unit MLP (segmentation / PU-Net).

    Reference model/pointnet2_utils.py:262-312.
    """

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        xyz_dst: jax.Array,
        xyz_src: jax.Array,
        feat_dst: jax.Array | None,
        feat_src: jax.Array,
        train: bool = False,
    ):
        from pointcloudattack_tpu.ops.interpolate import three_nn_interpolate

        n = xyz_dst.shape[1]
        if xyz_src.shape[1] == 1:
            interp = jnp.repeat(feat_src, n, axis=1)
        else:
            interp = three_nn_interpolate(xyz_dst, xyz_src, feat_src)
        if feat_dst is not None:
            interp = jnp.concatenate([feat_dst, interp], axis=-1)
        return PointMLP(self.mlp, name="mlp")(interp, train=train)


class _ClsHead(nn.Module):
    """Shared 1024 -> 512 -> 256 -> k head with dropout."""

    num_classes: int
    drop1: float = 0.4
    drop2: float = 0.4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = PointMLP([512], name="fc1")(x, train=train)
        x = nn.Dropout(self.drop1, deterministic=not train)(x)
        x = PointMLP([256], name="fc2")(x, train=train)
        x = nn.Dropout(self.drop2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc3")(x)


class PointNet2SSG(nn.Module):
    """PointNet++ single-scale-grouping classifier.

    Reference model/pointnet2_SSG.py:230-254 (SA 512/.2/32 -> SA 128/.4/64
    -> SA group-all -> FC head, log-softmax output).
    """

    num_classes: int = 40

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        train: bool = False,
        fps_key: jax.Array | None = None,
    ):
        keys = (
            jax.random.split(fps_key, 2) if fps_key is not None else (None, None)
        )
        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, [64, 64, 128], name="sa1")(
            xyz, None, train=train, fps_key=keys[0]
        )
        l2_xyz, l2 = SetAbstraction(128, 0.4, 64, [128, 128, 256], name="sa2")(
            l1_xyz, l1, train=train, fps_key=keys[1]
        )
        _, l3 = SetAbstraction(
            None, None, None, [256, 512, 1024], group_all=True, name="sa3"
        )(l2_xyz, l2, train=train)
        x = l3[:, 0, :]  # [B, 1024]
        logits = _ClsHead(self.num_classes, name="head")(x, train=train)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, {}


class PointNet2MSG(nn.Module):
    """PointNet++ multi-scale-grouping classifier.

    Reference model/pointnet2_MSG.py:194-227 with normal_channel=False
    (the only configuration the reference CLIs use, train.py:100).
    """

    num_classes: int = 40

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        train: bool = False,
        fps_key: jax.Array | None = None,
    ):
        keys = (
            jax.random.split(fps_key, 2) if fps_key is not None else (None, None)
        )
        l1_xyz, l1 = SetAbstractionMSG(
            512,
            [0.1, 0.2, 0.4],
            [16, 32, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]],
            name="sa1",
        )(xyz, None, train=train, fps_key=keys[0])
        l2_xyz, l2 = SetAbstractionMSG(
            128,
            [0.2, 0.4, 0.8],
            [32, 64, 128],
            [[64, 64, 128], [128, 128, 256], [128, 128, 256]],
            name="sa2",
        )(l1_xyz, l1, train=train, fps_key=keys[1])
        _, l3 = SetAbstraction(
            None, None, None, [256, 512, 1024], group_all=True,
            family="msg", name="sa3",
        )(l2_xyz, l2, train=train)
        x = l3[:, 0, :]
        logits = _ClsHead(self.num_classes, drop2=0.5, name="head")(
            x, train=train
        )
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, {}
