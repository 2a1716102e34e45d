"""Per-point segmentation training path (PointNetDenseCls)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.models.pointnet import PointNetDenseCls
from pointcloudattack_tpu.train.trainer import (
    TrainConfig,
    make_train_step,
    make_optimizer,
)


def test_seg_train_step_learns():
    """A few seg steps on a separable toy task must reduce the loss."""
    num_parts, n = 2, 64
    rng = np.random.RandomState(0)
    # part label = whether z > 0 (easy geometry task)
    clouds = rng.randn(8, n, 3).astype(np.float32)
    labels = (clouds[..., 2] > 0).astype(np.int64)

    model = PointNetDenseCls(num_classes=num_parts)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, n, 3)),
        train=False,
    )
    cfg = TrainConfig(task="seg", batch_size=8)
    step = make_train_step(model, cfg, steps_per_epoch=1)
    params = variables["params"]
    bs = variables["batch_stats"]
    opt_state = make_optimizer(cfg, 1).init(params)

    losses = []
    for i in range(30):
        params, bs, opt_state, metrics = step(
            params, bs, opt_state,
            jnp.asarray(clouds), jnp.asarray(labels),
            jax.random.PRNGKey(i),
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7
    out, _ = model.apply(
        {"params": params, "batch_stats": bs},
        jnp.asarray(clouds), train=False,
    )
    assert out.shape == (8, n, num_parts)
    acc = float(np.mean(np.argmax(np.asarray(out), -1) == labels))
    assert acc > 0.8
