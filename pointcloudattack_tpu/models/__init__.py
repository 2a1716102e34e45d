"""L1 victim models.

All models share one calling convention (the reference's only "framework"
glue, see reference model/pointnet.py:143-148 and SURVEY.md §1):

    log_probs, aux = model.apply(variables, x, train=False)

with ``x`` channels-last ``[B, N, 3]`` and ``log_probs`` ``[B, num_classes]``
(CurveNet emits raw logits, like the reference — see OUTPUT_KIND).

``make_model(name, num_classes)`` builds a model by CLI name;
``init_model`` initializes variables on a dummy cloud.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.models.pointnet import (
    PointNetCls,
    PointNetDenseCls,
    PointNetFeat,
    STN,
)
from pointcloudattack_tpu.models.pointnet2 import (
    PointNet2MSG,
    PointNet2SSG,
    SetAbstraction,
    SetAbstractionMSG,
    FeaturePropagation,
)
from pointcloudattack_tpu.models.dgcnn import DGCNN
from pointcloudattack_tpu.models.curvenet import CurveNet
from pointcloudattack_tpu.models.common import feature_transform_regularizer

# CLI names follow the reference's train.py flags (train.py:96-109).
MODEL_REGISTRY = {
    "PointNet": lambda num_classes, **kw: PointNetCls(
        num_classes=num_classes, **kw
    ),
    "PointNet++Ssg": lambda num_classes, **kw: PointNet2SSG(
        num_classes=num_classes, **kw
    ),
    "PointNet++Msg": lambda num_classes, **kw: PointNet2MSG(
        num_classes=num_classes, **kw
    ),
    "DGCNN": lambda num_classes, **kw: DGCNN(num_classes=num_classes, **kw),
    "CurveNet": lambda num_classes, **kw: CurveNet(
        num_classes=num_classes, **kw
    ),
}

# Whether the model's first output is log-probs or raw logits.
OUTPUT_KIND = {
    "PointNet": "log_probs",
    "PointNet++Ssg": "log_probs",
    "PointNet++Msg": "log_probs",
    "DGCNN": "log_probs",
    "CurveNet": "logits",
}

MODEL_NAMES = tuple(MODEL_REGISTRY)


def make_model(name: str, num_classes: int, **kw):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; choose from {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](num_classes, **kw)


def init_model(
    model: Any,
    key: jax.Array,
    num_points: int = 1024,
    batch: int = 2,
) -> dict:
    """Initialize variables (params + batch_stats) on a dummy cloud.

    The init is run under jit: eager flax init dispatches every op
    individually, which on the axon TPU pays the ~25 ms tunnel RTT per
    op (CurveNet: minutes; jitted: one dispatch). Same PRNG stream, same
    values.
    """
    dummy = jnp.zeros((batch, num_points, 3), dtype=jnp.float32)
    return jax.jit(
        lambda k, d: model.init({"params": k}, d, train=False)
    )(key, dummy)


__all__ = [
    "MODEL_REGISTRY",
    "MODEL_NAMES",
    "OUTPUT_KIND",
    "make_model",
    "init_model",
    "PointNetCls",
    "PointNetDenseCls",
    "PointNetFeat",
    "STN",
    "PointNet2SSG",
    "PointNet2MSG",
    "SetAbstraction",
    "SetAbstractionMSG",
    "FeaturePropagation",
    "DGCNN",
    "CurveNet",
    "feature_transform_regularizer",
]
