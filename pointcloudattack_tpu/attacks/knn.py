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
from pointcloudattack_tpu.losses.geometry import nn1_idx
from pointcloudattack_tpu.ops.gather import index_points


@dataclasses.dataclass(frozen=True)
class KNNAttackConfig:
    attack_lr: float = 1e-2
    num_iter: int = 2500  # KNN_attack.py default; Eval_KNN uses 100
    kappa: float = 30.0
    budget: float = 0.18
    targeted: bool = False
    adv_func: str = "logits"
    init_noise_scale: float = 1e-7
    # recompute the Chamfer nearest-clean-point index every R iterations
    # and evaluate the distance term against the cached match in between
    # (an O(N) gather instead of the [N, N] pairwise + VJP).  1 =
    # reference per-iteration semantics (KNN_attack.py:118-123); the
    # cached distance upper-bounds the true Chamfer and coincides with
    # it on refresh iterations.  ASR parity at R=5 is pinned by
    # tests/test_attack_families.py::test_knn_nn_refresh_asr_parity.
    nn_refresh: int = 1


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

    if cfg.nn_refresh < 1:
        raise ValueError(
            f"nn_refresh must be >= 1, got {cfg.nn_refresh} "
            "(1 = reference per-iteration recompute)"
        )
    cache_nn = cfg.nn_refresh > 1
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

        def step(carry, it):
            adv, opt_state, nn_i = carry

            if cache_nn:
                nn_i = jax.lax.cond(
                    it % cfg.nn_refresh == 0,
                    lambda: nn1_idx(adv, ori),
                    lambda: nn_i,
                )
                nearest = index_points(ori, nn_i)  # [B, N, 3], constant

            def total_loss(a):
                lg = model_fn(a)
                # sum instead of mean * K: reference multiplies the
                # Chamfer mean by num_points (KNN_attack.py:118-123)
                if cache_nn:
                    cham = jnp.mean(
                        jnp.sum((a - nearest) ** 2, axis=-1), axis=-1
                    )
                else:
                    cham = chamfer_dist(a, ori)
                return jnp.sum(adv_fn(lg, target) + cham * n)

            grads = jax.grad(total_loss)(adv)
            updates, opt_state = opt.update(grads, opt_state, adv)
            adv = optax.apply_updates(adv, updates)
            adv = jax.lax.stop_gradient(
                project_inner_clip_linf(adv, ori, cfg.budget, nrm)
            )
            return (adv, opt_state, nn_i), None

        # iteration 0 always refreshes, so the int32 init is never read
        nn_i0 = jnp.zeros((b, n), dtype=jnp.int32)
        (adv, _, _), _ = jax.lax.scan(
            step,
            (adv0, opt.init(adv0), nn_i0),
            jnp.arange(cfg.num_iter),
        )
        pred = jnp.argmax(model_fn(adv), axis=-1)
        success = pred == target if cfg.targeted else pred != target
        return adv, success

    return run
