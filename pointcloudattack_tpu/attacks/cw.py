"""CW perturbation attack (CVPR'19 "Generating 3D Adversarial Point Clouds").

Front-end wiring the shared engine exactly as reference
attack/CW/Eval_CW.py:148-161 does: untargeted logit-margin loss
(kappa=30), per-example-weighted global L2 distance, per-point Linf clip.
"""

from __future__ import annotations

import dataclasses

import jax

from pointcloudattack_tpu.attacks.engine import (
    CWConfig,
    CWResult,
    make_cw_attack_fn,
)
from pointcloudattack_tpu.constraints.clip import clip_points_linf
from pointcloudattack_tpu.losses.adv import (
    cross_entropy_adv_loss,
    logits_adv_loss,
    untargeted_logits_adv_loss,
)
from pointcloudattack_tpu.losses.distance import l2_dist


@dataclasses.dataclass(frozen=True)
class CWPerturbConfig(CWConfig):
    """Eval_CW.py defaults: kappa=30, budget 0.18, 10 x 500 iters."""

    kappa: float = 30.0
    budget: float = 0.18
    adv_func: str = "logits"  # "logits" | "cross_entropy"


def build_cw_attack(model_fn, cfg: CWPerturbConfig):
    """Compiled (data, target, key) -> CWResult for the plain CW attack."""
    if cfg.adv_func == "logits":
        if cfg.targeted:
            adv_fn = lambda lg, t: logits_adv_loss(lg, t, cfg.kappa)
        else:
            adv_fn = lambda lg, t: untargeted_logits_adv_loss(
                lg, t, cfg.kappa
            )
    else:
        if cfg.targeted:
            adv_fn = cross_entropy_adv_loss
        else:
            adv_fn = lambda lg, t: -cross_entropy_adv_loss(lg, t)

    clip = lambda adv, ori: clip_points_linf(adv, ori, cfg.budget)
    return make_cw_attack_fn(
        model_fn,
        cfg,
        adv_loss_fn=adv_fn,
        dist_loss_fn=l2_dist,
        clip_fn=clip,
    )
