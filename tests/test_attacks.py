"""End-to-end attack smoke tests: CW on a trained tiny PointNet must
reach ASR == 1.0 on trivially separable synthetic data (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudattack_tpu import models
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.attacks.engine import (
    shuffle_check,
    transfer_check,
)
from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
from pointcloudattack_tpu.train.trainer import TrainConfig, fit
from pointcloudattack_tpu.utils.apply import make_model_fn

NUM_CLASSES = 3
NUM_POINTS = 64


def test_cw_untargeted_reaches_full_asr(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(
        binary_step=3, num_iter=60, kappa=0.0, budget=0.45
    )
    attack = build_cw_attack(model_fn, cfg)
    data = jnp.asarray(clouds[:8])
    target = jnp.asarray(labels[:8])
    res = attack(data, target, jax.random.PRNGKey(1))

    success = np.asarray(res.success)
    assert success.all(), f"ASR {success.mean()} < 1.0"
    # perturbation respects the budget for successful (non-backfilled) runs
    diff = np.asarray(res.best_attack) - clouds[:8]
    norms = np.sqrt((diff**2).sum(-1))
    assert norms.max() <= cfg.budget + 1e-4
    # best_dist is the global L2 of the returned cloud
    np.testing.assert_allclose(
        np.asarray(res.best_dist),
        np.sqrt((diff**2).sum(axis=(1, 2))),
        rtol=1e-3,
    )


def test_cw_targeted(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(
        binary_step=3, num_iter=80, kappa=0.0, budget=0.45, targeted=True
    )
    attack = build_cw_attack(model_fn, cfg)
    data = jnp.asarray(clouds[:6])
    target = jnp.asarray((labels[:6] + 1) % NUM_CLASSES)
    res = attack(data, target, jax.random.PRNGKey(2))
    success = np.asarray(res.success)
    assert success.mean() >= 0.8
    assert (np.asarray(res.final_pred)[success] == np.asarray(target)[success]).all()


def test_shuffle_and_transfer_checks(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    adv = jnp.asarray(clouds[:4])
    target = jnp.asarray(labels[:4])
    # clean clouds are classified correctly -> "attack success" is False
    ok = shuffle_check(model_fn, adv, target, jax.random.PRNGKey(0))
    assert not np.asarray(ok).any()
    ok = transfer_check(model_fn, adv, target)
    assert not np.asarray(ok).any()


def test_backfill_on_hopeless_attack(trained_pointnet):
    """With a tiny budget + 1 iteration the attack fails and returns
    the (clipped) last iterate rather than zeros."""
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(binary_step=1, num_iter=1, budget=1e-6)
    attack = build_cw_attack(model_fn, cfg)
    data = jnp.asarray(clouds[:2])
    res = attack(data, jnp.asarray(labels[:2]), jax.random.PRNGKey(3))
    # backfilled attacks stay within float noise of the clean cloud
    np.testing.assert_allclose(
        np.asarray(res.best_attack), clouds[:2], atol=1e-4
    )
    assert not np.asarray(res.success).any()


def test_cw_bf16_forward_asr_parity(trained_pointnet):
    """Mixed-precision forward reaches the same ASR as f32."""
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables, compute_dtype=jnp.bfloat16)
    # a real margin (the reference ships kappa=30) is what makes bf16
    # attack outputs robust to the f32/bf16 rounding gap; kappa=0 clouds
    # hug the decision boundary and do not transfer between precisions
    cfg = CWPerturbConfig(binary_step=3, num_iter=100, kappa=3.0, budget=0.45)
    attack = build_cw_attack(model_fn, cfg)
    res = attack(
        jnp.asarray(clouds[:8]), jnp.asarray(labels[:8]),
        jax.random.PRNGKey(1),
    )
    assert np.asarray(res.success).mean() >= 0.875
    # and the adversarial clouds fool the full-precision model too
    f32_fn = make_model_fn(model, variables)
    pred = np.argmax(np.asarray(f32_fn(res.best_attack)), -1)
    assert (pred != labels[:8]).mean() >= 0.85
