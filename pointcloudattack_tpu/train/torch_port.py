"""Port reference PyTorch ``.pth`` checkpoints into flax variables.

The reference saves plain ``state_dict``s (reference train.py:187-194,
loaded back at e.g. attack/CW/Eval_CW.py:109-111).  This module maps those
tensors into this framework's flax trees so ASR-parity runs can reuse
reference-trained victims.

Tensor conventions:
  * torch Conv1d/Conv2d 1x1 weight [out, in, 1(,1)] -> Dense kernel
    [in, out] (our per-point MLPs are channels-last matmuls);
  * torch Linear weight [out, in] -> kernel [in, out];
  * BatchNorm weight/bias -> params scale/bias, running_mean/var ->
    batch_stats mean/var.

Supported: PointNet (reference model/pointnet.py), PointNet++ SSG/MSG
(model/pointnet2_SSG.py / _MSG.py), DGCNN (model/dgcnn.py).  CurveNet has
no shipped checkpoints and its momentum-MLP semantics differ (see
models/curvenet.py docstring), so it is intentionally not mapped.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    """torch.Tensor | np.ndarray -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_kernel(w) -> np.ndarray:
    w = _np(w)
    w = w.reshape(w.shape[0], w.shape[1])  # drop 1x1 spatial dims
    return w.T  # [in, out]


def _linear_kernel(w) -> np.ndarray:
    return _np(w).T


class _TreeBuilder:
    def __init__(self, sd: Mapping[str, "object"]):
        self.sd = sd
        self.params: dict = {}
        self.stats: dict = {}

    def _set(self, tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def dense(self, torch_name, flax_path, kind="conv", bias=True):
        kernel = (
            _conv_kernel(self.sd[torch_name + ".weight"])
            if kind == "conv"
            else _linear_kernel(self.sd[torch_name + ".weight"])
        )
        leaf = {"kernel": kernel}
        if bias and torch_name + ".bias" in self.sd:
            leaf["bias"] = _np(self.sd[torch_name + ".bias"])
        self._set(self.params, flax_path, leaf)

    def bn(self, torch_name, flax_path):
        self._set(
            self.params,
            flax_path,
            {
                "scale": _np(self.sd[torch_name + ".weight"]),
                "bias": _np(self.sd[torch_name + ".bias"]),
            },
        )
        self._set(
            self.stats,
            flax_path,
            {
                "mean": _np(self.sd[torch_name + ".running_mean"]),
                "var": _np(self.sd[torch_name + ".running_var"]),
            },
        )

    def variables(self):
        return {"params": self.params, "batch_stats": self.stats}


def _port_stn(b: _TreeBuilder, prefix: str, path: tuple):
    for i in range(3):
        b.dense(f"{prefix}.conv{i+1}", path + ("mlp", f"dense{i}"))
        b.bn(f"{prefix}.bn{i+1}", path + ("mlp", f"bn{i}"))
    for i in range(2):
        b.dense(f"{prefix}.fc{i+1}", path + ("fc", f"dense{i}"), kind="lin")
        b.bn(f"{prefix}.bn{i+4}", path + ("fc", f"bn{i}"))
    b.dense(f"{prefix}.fc3", path + ("out",), kind="lin")


def port_pointnet(sd: Mapping, feature_transform: bool = False) -> dict:
    """model/pointnet.py PointNetCls state_dict -> flax variables."""
    b = _TreeBuilder(sd)
    _port_stn(b, "feat.stn", ("feat", "stn"))
    if feature_transform:
        _port_stn(b, "feat.fstn", ("feat", "fstn"))
    for i, mlp in enumerate(["mlp1", "mlp2", "mlp3"]):
        b.dense(f"feat.conv{i+1}", ("feat", mlp, "dense0"))
        b.bn(f"feat.bn{i+1}", ("feat", mlp, "bn0"))
    b.dense("fc1", ("fc1", "dense0"), kind="lin")
    b.bn("bn1", ("fc1", "bn0"))
    b.dense("fc2", ("fc2",), kind="lin")
    b.bn("bn2", ("bn2",))
    b.dense("fc3", ("fc3",), kind="lin")
    return b.variables()


def port_pointnet2_ssg(sd: Mapping) -> dict:
    """model/pointnet2_SSG.py PointNet_Ssg state_dict -> flax variables."""
    b = _TreeBuilder(sd)
    for k in range(1, 4):
        for i in range(3):
            b.dense(
                f"sa{k}.mlp_convs.{i}", (f"sa{k}", "mlp", f"dense{i}")
            )
            b.bn(f"sa{k}.mlp_bns.{i}", (f"sa{k}", "mlp", f"bn{i}"))
    b.dense("fc1", ("head", "fc1", "dense0"), kind="lin")
    b.bn("bn1", ("head", "fc1", "bn0"))
    b.dense("fc2", ("head", "fc2", "dense0"), kind="lin")
    b.bn("bn2", ("head", "fc2", "bn0"))
    b.dense("fc3", ("head", "fc3"), kind="lin")
    return b.variables()


def port_pointnet2_msg(sd: Mapping) -> dict:
    """model/pointnet2_MSG.py PointNet_Msg state_dict -> flax variables."""
    b = _TreeBuilder(sd)
    for k in (1, 2):  # MSG layers with 3 branches x 3 convs
        for br in range(3):
            for i in range(3):
                b.dense(
                    f"sa{k}.conv_blocks.{br}.{i}",
                    (f"sa{k}", f"branch{br}", f"dense{i}"),
                )
                b.bn(
                    f"sa{k}.bn_blocks.{br}.{i}",
                    (f"sa{k}", f"branch{br}", f"bn{i}"),
                )
    for i in range(3):  # final group-all SA
        b.dense(f"sa3.mlp_convs.{i}", ("sa3", "mlp", f"dense{i}"))
        b.bn(f"sa3.mlp_bns.{i}", ("sa3", "mlp", f"bn{i}"))
    b.dense("fc1", ("head", "fc1", "dense0"), kind="lin")
    b.bn("bn1", ("head", "fc1", "bn0"))
    b.dense("fc2", ("head", "fc2", "dense0"), kind="lin")
    b.bn("bn2", ("head", "fc2", "bn0"))
    b.dense("fc3", ("head", "fc3"), kind="lin")
    return b.variables()


def port_dgcnn(sd: Mapping) -> dict:
    """model/dgcnn.py DGCNN state_dict -> flax variables.

    The reference wraps each EdgeConv in nn.Sequential(conv, bn, act), so
    tensors are named ``convK.0.*`` with BN params living both at
    ``convK.1.*`` and the aliased ``bnK.*`` (same storage).
    """
    b = _TreeBuilder(sd)
    for k in range(1, 5):
        b.dense(f"conv{k}.0", (f"conv{k}", "Dense_0"), bias=False)
        b.bn(f"bn{k}", (f"conv{k}", "BatchNorm_0"))
    b.dense("conv5.0", ("conv5",), bias=False)
    b.bn("bn5", ("bn5",))
    b.dense("linear1", ("linear1",), kind="lin", bias=False)
    b.bn("bn6", ("bn6",))
    b.dense("linear2", ("linear2",), kind="lin")
    b.bn("bn7", ("bn7",))
    b.dense("linear3", ("linear3",), kind="lin")
    return b.variables()


PORTERS = {
    "PointNet": port_pointnet,
    "PointNet++Ssg": port_pointnet2_ssg,
    "PointNet++Msg": port_pointnet2_msg,
    "DGCNN": port_dgcnn,
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
