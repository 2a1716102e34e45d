"""kNN attack (AAAI'20 "Robust Adversarial Objects against Deep Learning
Models") — single-phase Adam, no binary search.

Behavioral twin of reference attack/KNN/KNN_attack.py:56-246 with the
Eval_KNN.py wiring (attack/KNN/Eval_KNN.py:230-252): margin loss
(kappa=30), ChamferDist * num_points as the distance term, and
ProjectInnerClipLinf as the constraint.  Note the reference passes the
clean POSITIONS as "normals" when the input has no normal channel
(KNN_attack.py:69-74) — for centered clouds the position is a crude
outward normal; we reproduce that default but accept real normals.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from pointcloudattack_tpu.constraints.clip import project_inner_clip_linf
from pointcloudattack_tpu.losses.adv import (
    cross_entropy_adv_loss,
    logits_adv_loss,
    untargeted_logits_adv_loss,
)
from pointcloudattack_tpu.losses.distance import chamfer_dist


@dataclasses.dataclass(frozen=True)
class KNNAttackConfig:
    attack_lr: float = 1e-2
    num_iter: int = 2500  # KNN_attack.py default; Eval_KNN uses 100
    kappa: float = 30.0
    budget: float = 0.18
    targeted: bool = False
    adv_func: str = "logits"
    init_noise_scale: float = 1e-7


def build_knn_attack(model_fn, cfg: KNNAttackConfig):
    """Compiled (data, target, key, normals?) -> (adv [B,N,3], success [B])."""
    if cfg.adv_func == "logits":
        if cfg.targeted:
            adv_fn = lambda lg, t: logits_adv_loss(lg, t, cfg.kappa)
        else:
            adv_fn = lambda lg, t: untargeted_logits_adv_loss(lg, t, cfg.kappa)
    else:
        adv_fn = (
            cross_entropy_adv_loss
            if cfg.targeted
            else lambda lg, t: -cross_entropy_adv_loss(lg, t)
        )

    opt = optax.adam(cfg.attack_lr)

    @jax.jit
    def run(data, target, key, normals=None):
        b, n, _ = data.shape
        ori = data
        nrm = ori if normals is None else normals

        adv0 = ori + (
            jax.random.normal(key, ori.shape, dtype=ori.dtype)
            * cfg.init_noise_scale
        )

        def step(carry, _):
            adv, opt_state = carry

            def total_loss(a):
                lg = model_fn(a)
                # sum instead of mean * K: reference multiplies the
                # Chamfer mean by num_points (KNN_attack.py:118-123)
                return jnp.sum(
                    adv_fn(lg, target) + chamfer_dist(a, ori) * n
                )

            grads = jax.grad(total_loss)(adv)
            updates, opt_state = opt.update(grads, opt_state, adv)
            adv = optax.apply_updates(adv, updates)
            adv = jax.lax.stop_gradient(
                project_inner_clip_linf(adv, ori, cfg.budget, nrm)
            )
            return (adv, opt_state), None

        (adv, _), _ = jax.lax.scan(
            step, (adv0, opt.init(adv0)), None, length=cfg.num_iter
        )
        pred = jnp.argmax(model_fn(adv), axis=-1)
        success = pred == target if cfg.targeted else pred != target
        return adv, success

    return run
