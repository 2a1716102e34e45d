"""Port reference PyTorch ``.pth`` checkpoints into flax variables (and back).

The reference saves plain ``state_dict``s (reference train.py:187-194,
loaded back at e.g. attack/CW/Eval_CW.py:109-111).  This module maps those
tensors into this framework's flax trees so ASR-parity runs can reuse
reference-trained victims, and inversely exports flax-trained variables to
reference-layout state dicts (so the reference attack code can be run
against the same weights — used by tests/test_reference_parity.py).

Tensor conventions:
  * torch Conv1d/Conv2d 1x1 weight [out, in, 1(,1)] -> Dense kernel
    [in, out] (our per-point MLPs are channels-last matmuls);
  * torch Linear weight [out, in] -> kernel [in, out];
  * BatchNorm weight/bias -> params scale/bias, running_mean/var ->
    batch_stats mean/var (num_batches_tracked is synthesized on export).

Supported: PointNet (reference model/pointnet.py), PointNet++ SSG/MSG
(model/pointnet2_SSG.py / _MSG.py), DGCNN (model/dgcnn.py), PU-Net
(attack/SIadv/baselines/defense/DUP_Net/pu_net.py:8-131, the DUP-Net
upsampler), CurveNet (model/curvenet.py:11-73 + curvenet_util.py +
walk.py — no checkpoints ship with the reference, but user-trained ones
port; run the ported weights with ``CurveNet(walk_compat=True)`` to
reproduce the reference Walk's scrambled momentum view exactly, see
models/curvenet.py docstring).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import numpy as np


def _np(t):
    """torch.Tensor | np.ndarray -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


# ---------------------------------------------------------------------------
# Bidirectional mapping spec
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _DenseEntry:
    torch_name: str
    flax_path: tuple
    spatial: int  # 0 = Linear, 1 = Conv1d 1x1, 2 = Conv2d 1x1


@dataclasses.dataclass(frozen=True)
class _BNEntry:
    torch_name: str
    flax_path: tuple


class _Spec:
    """Records the torch-name <-> flax-path correspondence of one model."""

    def __init__(self):
        self.entries: list = []

    def dense(self, torch_name, flax_path, kind="conv1d"):
        spatial = {"lin": 0, "conv1d": 1, "conv2d": 2}[kind]
        self.entries.append(_DenseEntry(torch_name, tuple(flax_path), spatial))

    def bn(self, torch_name, flax_path):
        self.entries.append(_BNEntry(torch_name, tuple(flax_path)))


def _set(tree, path, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _apply_port(spec: _Spec, sd: Mapping) -> dict:
    """torch state_dict -> flax variables along the spec."""
    params: dict = {}
    stats: dict = {}
    for e in spec.entries:
        if isinstance(e, _DenseEntry):
            w = _np(sd[e.torch_name + ".weight"])
            if e.spatial:
                w = w.reshape(w.shape[0], w.shape[1])
            leaf = {"kernel": w.T}
            if e.torch_name + ".bias" in sd:
                leaf["bias"] = _np(sd[e.torch_name + ".bias"])
            _set(params, e.flax_path, leaf)
        else:
            _set(
                params,
                e.flax_path,
                {
                    "scale": _np(sd[e.torch_name + ".weight"]),
                    "bias": _np(sd[e.torch_name + ".bias"]),
                },
            )
            _set(
                stats,
                e.flax_path,
                {
                    "mean": _np(sd[e.torch_name + ".running_mean"]),
                    "var": _np(sd[e.torch_name + ".running_var"]),
                },
            )
    return {"params": params, "batch_stats": stats}


def _apply_export(spec: _Spec, variables: Mapping) -> dict:
    """flax variables -> reference-layout numpy state_dict along the spec."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}
    for e in spec.entries:
        if isinstance(e, _DenseEntry):
            leaf = _get(params, e.flax_path)
            w = _np(leaf["kernel"]).T  # [out, in]
            w = w.reshape(w.shape + (1,) * e.spatial)
            sd[e.torch_name + ".weight"] = w
            if "bias" in leaf:
                sd[e.torch_name + ".bias"] = _np(leaf["bias"])
        else:
            leaf = _get(params, e.flax_path)
            st = _get(stats, e.flax_path)
            sd[e.torch_name + ".weight"] = _np(leaf["scale"])
            sd[e.torch_name + ".bias"] = _np(leaf["bias"])
            sd[e.torch_name + ".running_mean"] = _np(st["mean"])
            sd[e.torch_name + ".running_var"] = _np(st["var"])
            sd[e.torch_name + ".num_batches_tracked"] = np.asarray(
                0, dtype=np.int64
            )
    return sd


# ---------------------------------------------------------------------------
# Per-model specs
# ---------------------------------------------------------------------------

def _stn_spec(s: _Spec, prefix: str, path: tuple):
    for i in range(3):
        s.dense(f"{prefix}.conv{i+1}", path + ("mlp", f"dense{i}"))
        s.bn(f"{prefix}.bn{i+1}", path + ("mlp", f"bn{i}"))
    for i in range(2):
        s.dense(f"{prefix}.fc{i+1}", path + ("fc", f"dense{i}"), kind="lin")
        s.bn(f"{prefix}.bn{i+4}", path + ("fc", f"bn{i}"))
    s.dense(f"{prefix}.fc3", path + ("out",), kind="lin")


def pointnet_spec(feature_transform: bool = False) -> _Spec:
    """model/pointnet.py PointNetCls layout."""
    s = _Spec()
    _stn_spec(s, "feat.stn", ("feat", "stn"))
    if feature_transform:
        _stn_spec(s, "feat.fstn", ("feat", "fstn"))
    for i, mlp in enumerate(["mlp1", "mlp2", "mlp3"]):
        s.dense(f"feat.conv{i+1}", ("feat", mlp, "dense0"))
        s.bn(f"feat.bn{i+1}", ("feat", mlp, "bn0"))
    s.dense("fc1", ("fc1", "dense0"), kind="lin")
    s.bn("bn1", ("fc1", "bn0"))
    s.dense("fc2", ("fc2",), kind="lin")
    s.bn("bn2", ("bn2",))
    s.dense("fc3", ("fc3",), kind="lin")
    return s


def pointnet2_ssg_spec() -> _Spec:
    """model/pointnet2_SSG.py PointNet_Ssg layout."""
    s = _Spec()
    for k in range(1, 4):
        for i in range(3):
            s.dense(
                f"sa{k}.mlp_convs.{i}",
                (f"sa{k}", "mlp", f"dense{i}"),
                kind="conv2d",
            )
            s.bn(f"sa{k}.mlp_bns.{i}", (f"sa{k}", "mlp", f"bn{i}"))
    s.dense("fc1", ("head", "fc1", "dense0"), kind="lin")
    s.bn("bn1", ("head", "fc1", "bn0"))
    s.dense("fc2", ("head", "fc2", "dense0"), kind="lin")
    s.bn("bn2", ("head", "fc2", "bn0"))
    s.dense("fc3", ("head", "fc3"), kind="lin")
    return s


def pointnet2_msg_spec() -> _Spec:
    """model/pointnet2_MSG.py PointNet_Msg layout."""
    s = _Spec()
    for k in (1, 2):  # MSG layers with 3 branches x 3 convs
        for br in range(3):
            for i in range(3):
                s.dense(
                    f"sa{k}.conv_blocks.{br}.{i}",
                    (f"sa{k}", f"branch{br}", f"dense{i}"),
                    kind="conv2d",
                )
                s.bn(
                    f"sa{k}.bn_blocks.{br}.{i}",
                    (f"sa{k}", f"branch{br}", f"bn{i}"),
                )
    for i in range(3):  # final group-all SA
        s.dense(
            f"sa3.mlp_convs.{i}", ("sa3", "mlp", f"dense{i}"), kind="conv2d"
        )
        s.bn(f"sa3.mlp_bns.{i}", ("sa3", "mlp", f"bn{i}"))
    s.dense("fc1", ("head", "fc1", "dense0"), kind="lin")
    s.bn("bn1", ("head", "fc1", "bn0"))
    s.dense("fc2", ("head", "fc2", "dense0"), kind="lin")
    s.bn("bn2", ("head", "fc2", "bn0"))
    s.dense("fc3", ("head", "fc3"), kind="lin")
    return s


def dgcnn_spec() -> _Spec:
    """model/dgcnn.py DGCNN layout.

    The reference wraps each EdgeConv in nn.Sequential(conv, bn, act), so
    tensors are named ``convK.0.*`` with BN params living both at
    ``convK.1.*`` and the aliased ``bnK.*`` (same storage).
    """
    s = _Spec()
    for k in range(1, 5):
        s.dense(f"conv{k}.0", (f"conv{k}", "Dense_0"), kind="conv2d")
        s.bn(f"bn{k}", (f"conv{k}", "BatchNorm_0"))
    s.dense("conv5.0", ("conv5",))
    s.bn("bn5", ("bn5",))
    s.dense("linear1", ("linear1",), kind="lin")
    s.bn("bn6", ("bn6",))
    s.dense("linear2", ("linear2",), kind="lin")
    s.bn("bn7", ("bn7",))
    s.dense("linear3", ("linear3",), kind="lin")
    return s


def punet_spec(up_ratio: int = 4) -> _Spec:
    """DUP_Net/pu_net.py PUNet layout (pu-in_1024-up_4.pth).

    DUP-Net builds PUNet with ``use_bn=False`` (DUP_Net.py:22-23), so the
    checkpoint carries only conv weight+bias tensors: 4 SA modules
    (``SA_modules.K.mlps.0.layerI.conv``, Conv2d 1x1 — pu_net.py:47-59),
    3 FP modules with mlp=[64] (``FP_Modules.K.mlp.layer0.conv``,
    pu_net.py:62-68), ``up_ratio`` expansion branches of SharedMLP
    [in,256,128] (``FC_Modules.K.layerI.conv``, pu_net.py:71-78), and the
    coordinate head Sequential(SharedMLP[128,64], SharedMLP[64,3])
    (``pcd_layer.{0,1}.layer0.conv``, pu_net.py:81-85).
    """
    s = _Spec()
    mlps = [[32, 32, 64], [64, 64, 128], [128, 128, 256], [256, 256, 512]]
    for k, mlp in enumerate(mlps):
        for i in range(len(mlp)):
            s.dense(
                f"SA_modules.{k}.mlps.0.layer{i}.conv",
                (f"sa{k}", "mlp", f"dense{i}"),
                kind="conv2d",
            )
    for k in range(3):
        s.dense(
            f"FP_Modules.{k}.mlp.layer0.conv", (f"fp{k}", "dense0"),
            kind="conv2d",
        )
    for k in range(up_ratio):
        for i in range(2):
            s.dense(
                f"FC_Modules.{k}.layer{i}.conv",
                (f"expand{k}", f"dense{i}"),
                kind="conv2d",
            )
    s.dense("pcd_layer.0.layer0.conv", ("recon0", "dense0"), kind="conv2d")
    s.dense("pcd_layer.1.layer0.conv", ("recon1",), kind="conv2d")
    return s


# CIC blocks of model/curvenet.py:21-39: (name, in_ch, out_ch, has_curves
# per setting).  Mirrors curve_config (model/curvenet.py:5-8): 'default'
# runs curves in stages 1-2, 'long' only in stage 1.
_CURVENET_CICS = [
    ("cic11", 32, 64, 0),
    ("cic12", 64, 64, 0),
    ("cic21", 64, 128, 1),
    ("cic22", 128, 128, 1),
    ("cic31", 128, 256, 2),
    ("cic32", 256, 256, 2),
    ("cic41", 256, 512, 3),
    ("cic42", 512, 512, 3),
]
_CURVENET_HAS_CURVE = {"default": (True, True, False, False),
                       "long": (True, False, False, False)}


def curvenet_spec(setting: str = "default") -> _Spec:
    """model/curvenet.py CurveNet layout.

    The reference wraps 1x1 convs in nn.Sequential(conv, bn[, act]) so
    tensors are ``<mod>.0.*`` / ``<mod>.1.*``; the Walk MLPs live at
    ``cicXY.curvegrouping.walk.{agent,momentum}_mlp.{0,1}`` (walk.py:46-55).
    """
    s = _Spec()
    s.dense("lpfa.mlp.0.0", ("lpfa", "mlp0", "Dense_0"), kind="conv2d")
    s.bn("lpfa.mlp.0.1", ("lpfa", "mlp0", "BatchNorm_0"))
    has_curve = _CURVENET_HAS_CURVE[setting]
    for name, cin, cout, stage in _CURVENET_CICS:
        s.dense(f"{name}.conv1.0", (name, "conv1", "Dense_0"))
        s.bn(f"{name}.conv1.1", (name, "conv1", "BatchNorm_0"))
        if has_curve[stage]:
            cg = (name, "curvegrouping")
            s.dense(f"{name}.curvegrouping.att", cg + ("att",))
            s.dense(
                f"{name}.curvegrouping.walk.agent_mlp.0",
                cg + ("walk", "agent_mlp", "Dense_0"),
                kind="conv2d",
            )
            s.bn(
                f"{name}.curvegrouping.walk.agent_mlp.1",
                cg + ("walk", "agent_mlp", "BatchNorm_0"),
            )
            s.dense(
                f"{name}.curvegrouping.walk.momentum_mlp.0",
                cg + ("walk", "momentum_mlp", "Dense_0"),
            )
            s.bn(
                f"{name}.curvegrouping.walk.momentum_mlp.1",
                cg + ("walk", "momentum_mlp", "BatchNorm_0"),
            )
            ca = (name, "curveaggregation")
            for conv in ("conva", "convb", "convc", "convn", "convl"):
                s.dense(f"{name}.curveaggregation.{conv}", ca + (conv,))
            s.dense(f"{name}.curveaggregation.convd.0", ca + ("convd",))
            s.bn(f"{name}.curveaggregation.convd.1", ca + ("convd_bn",))
            s.dense(
                f"{name}.curveaggregation.line_conv_att",
                ca + ("line_conv_att",),
                kind="conv2d",
            )
        s.dense(
            f"{name}.lpfa.xyz2feature.0",
            (name, "lpfa", "xyz2feature"),
            kind="conv2d",
        )
        s.bn(f"{name}.lpfa.xyz2feature.1", (name, "lpfa", "xyz2feature_bn"))
        s.dense(
            f"{name}.lpfa.mlp.0.0",
            (name, "lpfa", "mlp0", "Dense_0"),
            kind="conv2d",
        )
        s.bn(f"{name}.lpfa.mlp.0.1", (name, "lpfa", "mlp0", "BatchNorm_0"))
        s.dense(f"{name}.conv2.0", (name, "conv2", "Dense_0"))
        s.bn(f"{name}.conv2.1", (name, "conv2", "BatchNorm_0"))
        if cin != cout:
            s.dense(f"{name}.shortcut.0", (name, "shortcut", "Dense_0"))
            s.bn(f"{name}.shortcut.1", (name, "shortcut", "BatchNorm_0"))
    s.dense("conv0.0", ("conv0",))
    s.bn("conv0.1", ("bn0",))
    s.dense("conv1", ("conv1",), kind="lin")
    s.bn("bn1", ("bn1",))
    s.dense("conv2", ("conv2",), kind="lin")
    return s


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def port_pointnet(sd: Mapping, feature_transform: bool = False) -> dict:
    """model/pointnet.py PointNetCls state_dict -> flax variables."""
    return _apply_port(pointnet_spec(feature_transform), sd)


def port_pointnet2_ssg(sd: Mapping) -> dict:
    """model/pointnet2_SSG.py PointNet_Ssg state_dict -> flax variables."""
    return _apply_port(pointnet2_ssg_spec(), sd)


def port_pointnet2_msg(sd: Mapping) -> dict:
    """model/pointnet2_MSG.py PointNet_Msg state_dict -> flax variables."""
    return _apply_port(pointnet2_msg_spec(), sd)


def port_dgcnn(sd: Mapping) -> dict:
    """model/dgcnn.py DGCNN state_dict -> flax variables."""
    return _apply_port(dgcnn_spec(), sd)


def port_punet(sd: Mapping, up_ratio: int = 4) -> dict:
    """DUP_Net/pu_net.py PUNet state_dict -> flax variables.

    Enables DUP-Net (pointcloudattack_tpu/defense/dupnet.py) to run with the reference's
    trained ``pu-in_1024-up_4.pth`` upsampler weights
    (DUP_Net/DUP_Net.py:24-28).
    """
    return _apply_port(punet_spec(up_ratio=up_ratio), sd)


def export_pointnet(
    variables: Mapping, feature_transform: bool = False
) -> dict:
    """flax PointNet variables -> reference-layout numpy state_dict."""
    return _apply_export(pointnet_spec(feature_transform), variables)


def export_pointnet2_ssg(variables: Mapping) -> dict:
    return _apply_export(pointnet2_ssg_spec(), variables)


def export_pointnet2_msg(variables: Mapping) -> dict:
    return _apply_export(pointnet2_msg_spec(), variables)


def export_dgcnn(variables: Mapping) -> dict:
    return _apply_export(dgcnn_spec(), variables)


def export_punet(variables: Mapping, up_ratio: int = 4) -> dict:
    return _apply_export(punet_spec(up_ratio=up_ratio), variables)


def port_curvenet(sd: Mapping, setting: str = "default") -> dict:
    """model/curvenet.py CurveNet state_dict -> flax variables.

    Run the result with ``CurveNet(walk_compat=True)`` for reference
    semantics (the scrambled momentum view, model/walk.py:103-105).
    """
    return _apply_port(curvenet_spec(setting), sd)


def export_curvenet(variables: Mapping, setting: str = "default") -> dict:
    return _apply_export(curvenet_spec(setting), variables)


PORTERS = {
    "PointNet": port_pointnet,
    "PointNet++Ssg": port_pointnet2_ssg,
    "PointNet++Msg": port_pointnet2_msg,
    "DGCNN": port_dgcnn,
    "PUNet": port_punet,
    "CurveNet": port_curvenet,
}

EXPORTERS = {
    "PointNet": export_pointnet,
    "PointNet++Ssg": export_pointnet2_ssg,
    "PointNet++Msg": export_pointnet2_msg,
    "DGCNN": export_dgcnn,
    "PUNet": export_punet,
    "CurveNet": export_curvenet,
}


def load_torch_checkpoint(path: str):
    """Load a .pth state_dict on CPU (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # strip DataParallel prefixes
    return {k.removeprefix("module."): v for k, v in sd.items()}


def port_checkpoint(model_name: str, path_or_sd) -> dict:
    """One-call port: .pth path or state_dict -> flax variables."""
    sd = (
        load_torch_checkpoint(path_or_sd)
        if isinstance(path_or_sd, str)
        else path_or_sd
    )
    return PORTERS[model_name](sd)


def export_checkpoint(model_name: str, variables: Mapping) -> dict:
    """One-call export: flax variables -> reference-layout state_dict."""
    return EXPORTERS[model_name](variables)
