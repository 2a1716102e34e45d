"""Robust-CW (additional_exp) variant smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.attacks.cw_robust import (
    RobustCWConfig,
    build_robust_cw_attack,
    _axis_rotations,
    _renormalize,
)
from pointcloudattack_tpu.losses.distance import l2_dist
from pointcloudattack_tpu.utils.apply import make_model_fn


def test_axis_rotations_orthonormal():
    rots = np.asarray(_axis_rotations(jax.random.PRNGKey(0), 10, 1e-2))
    assert rots.shape == (10, 3, 3)
    prod = np.einsum("tij,tkj->tik", rots, rots)
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-5
    )


def test_renormalize():
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 3).astype(np.float32) * 5 + 3
    )
    out = np.asarray(_renormalize(x))
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1).max(axis=1), 1.0, atol=1e-5
    )


def test_untargeted_with_all_toggles(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = RobustCWConfig(
        binary_step=2, num_iter=40, targeted=False, kappa=0.0,
        whether_1d=False, renormalization=True, transform_eot=True,
        num_eot=4, resample=True,
    )
    attack = build_robust_cw_attack(model_fn, l2_dist, cfg)
    adv, dist, success = attack(
        jnp.asarray(clouds[:3]), jnp.asarray(labels[:3]),
        jax.random.PRNGKey(0),
    )
    assert np.all(np.isfinite(np.asarray(adv)))
    # EOT/renorm/resample robust attack on separable data should mostly win
    assert np.asarray(success).mean() >= 0.5


def test_whether_1d_freezes_xy_and_boxes_z(trained_pointnet):
    """z-only mode (reference additional_exp/CW_attack.py:268-275):
    x/y must be untouched, z within the +-0.4 box."""
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = RobustCWConfig(
        binary_step=2, num_iter=60, targeted=False, kappa=0.0,
        whether_1d=True,
    )
    attack = build_robust_cw_attack(model_fn, l2_dist, cfg)
    data = jnp.asarray(clouds[:3])
    adv, dist, success = attack(
        data, jnp.asarray(labels[:3]), jax.random.PRNGKey(1)
    )
    adv = np.asarray(adv)
    ori = np.asarray(data)
    # init noise (1e-7) is the only x/y change the loop may leave behind
    np.testing.assert_allclose(adv[..., :2], ori[..., :2], atol=1e-5)
    dz = np.abs(adv[..., 2] - ori[..., 2])
    assert dz.max() <= cfg.box_constraint + 1e-5
    assert dz.max() > 1e-4  # something actually moved
    assert np.all(np.isfinite(np.asarray(dist)))
