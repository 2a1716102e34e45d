"""Defense pre-head wrapping + transfer matrix + shuffle robustness."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.attacks.evaluation import (
    shuffle_robustness,
    transfer_matrix,
    with_defense,
)
from pointcloudattack_tpu.utils.apply import make_model_fn


def test_with_defense_sor_srs(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    x = jnp.asarray(clouds[:4])
    for d in ("sor", "srs"):
        fn = with_defense(model_fn, d, key=jax.random.PRNGKey(0))
        out = fn(x)
        assert out.shape == (4, 3)
        # clean clouds should survive the defense -> still classified right
        pred = np.argmax(np.asarray(out), -1)
        assert (pred == labels[:4]).mean() >= 0.75


def test_transfer_matrix(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    mat = transfer_matrix(
        {"self": model_fn}, jnp.asarray(clouds[:6]),
        jnp.asarray(labels[:6]),
    )
    # clean clouds against the same model: no transfer success
    assert mat["self"] == 0.0


def test_transfer_matrix_device_placement(trained_pointnet):
    """devices= spreads panel members round-robin over the mesh with
    results identical to the sequential default (per-model placement is
    throughput-only — each member is the same single-device program)."""
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    # 3 members over 8 CPU devices: self twice (distinct keys) + a
    # randomly initialized second architecture
    from pointcloudattack_tpu import models as M

    other = M.make_model("PointNet", 3)
    ovars = M.init_model(
        other, jax.random.PRNGKey(7),
        num_points=clouds.shape[1], batch=2,
    )
    panel = {
        "self": model_fn,
        "self#2": model_fn,
        "rand": make_model_fn(other, ovars),
    }
    x, t = jnp.asarray(clouds[:6]), jnp.asarray(labels[:6])
    seq = transfer_matrix(panel, x, t)
    par = transfer_matrix(panel, x, t, devices=jax.devices())
    assert seq == par
    assert par["self"] == 0.0 and par["self#2"] == 0.0


def test_shuffle_robustness(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    rate = shuffle_robustness(
        model_fn, jnp.asarray(clouds[:6]), jnp.asarray(labels[:6]),
        jax.random.PRNGKey(0), num_trials=2,
    )
    # PointNet is permutation invariant; clean clouds stay correct
    assert rate == 0.0
