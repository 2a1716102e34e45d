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


def test_shuffle_robustness(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    rate = shuffle_robustness(
        model_fn, jnp.asarray(clouds[:6]), jnp.asarray(labels[:6]),
        jax.random.PRNGKey(0), num_trials=2,
    )
    # PointNet is permutation invariant; clean clouds stay correct
    assert rate == 0.0
