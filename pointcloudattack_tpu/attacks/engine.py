"""Shared C&W binary-search attack engine.

The reference's CW family (CW, KNN, Gen3DAdv perturb/add/cluster, and with
extensions GeoA3/AOF) all share one skeleton — an outer binary search over
the distance weight and an inner Adam loop with per-iteration best tracking
(reference attack/CW/CW_attack.py:57-260).  The reference syncs every
iteration to host numpy (CW_attack.py:129-153); here the whole attack is a
single ``jit``:

    lax.scan over binary steps
      └─ lax.scan over Adam iterations   [device-resident best tracking]

so the only host<->device traffic is one transfer of inputs and one of
results.  Everything is batched [B, N, 3]; per-example weights/bests are
vectors carried in scan state.

Numerics match the reference step-for-step: the evaluation (forward, best
update) happens BEFORE the optimizer step of each iteration, the clip runs
after the step, failed examples are back-filled with the last evaluated
iterate (CW_attack.py:206-209), and the bisection update uses the
round-success rule of CW_attack.py:181-200.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from pointcloudattack_tpu.losses.distance import l2_dist

# model_fn: [B, N, 3] -> logits [B, K]
ModelFn = Callable[[jax.Array], jax.Array]
# adv_loss_fn: (logits [B, K], target [B]) -> [B]
AdvLossFn = Callable[[jax.Array, jax.Array], jax.Array]
# dist_loss_fn: (adv, ori) -> [B]  (weighting applied by the engine)
DistLossFn = Callable[[jax.Array, jax.Array], jax.Array]
# clip_fn: (adv, ori) -> adv
ClipFn = Callable[[jax.Array, jax.Array], jax.Array]
# track_fn: distance used for best-so-far bookkeeping, (adv, ori) -> [B]
TrackFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class CWConfig:
    """Hyperparameters of the binary-search CW engine.

    Defaults follow reference attack/CW/CW_attack.py:26-37 and
    attack/CW/Eval_CW.py:76-93.
    """

    attack_lr: float = 1e-2
    init_weight: float = 10.0
    max_weight: float = 80.0
    binary_step: int = 10
    num_iter: int = 500
    targeted: bool = False
    init_noise_scale: float = 1e-7


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CWResult:
    """Per-example attack outcome (all device arrays)."""

    best_dist: jax.Array  # [B] tracking distance of the best adv example
    best_attack: jax.Array  # [B, N, 3]
    best_score: jax.Array  # [B] predicted class of best adv (-1 = none)
    success: jax.Array  # [B] bool
    final_pred: jax.Array  # [B] model prediction on best_attack


def _success(pred: jax.Array, target: jax.Array, targeted: bool) -> jax.Array:
    return pred == target if targeted else pred != target


def cw_attack(
    model_fn: ModelFn,
    data: jax.Array,
    target: jax.Array,
    key: jax.Array,
    cfg: CWConfig,
    adv_loss_fn: AdvLossFn,
    dist_loss_fn: DistLossFn,
    clip_fn: ClipFn | None = None,
    track_fn: TrackFn | None = None,
) -> CWResult:
    """Run the binary-search CW attack. Jit-safe; wrap in jax.jit yourself
    or use :func:`make_cw_attack_fn` for a cached compiled version.

    Args:
      model_fn: eval-mode forward returning logits/log-probs [B, K].
      data: [B, N, 3] clean clouds.
      target: [B] int labels — true labels (untargeted) or attack targets.
      key: PRNG key for the per-round init jitter.
      cfg: engine hyperparameters.
      adv_loss_fn / dist_loss_fn / clip_fn: attack-family plug-ins.
      track_fn: best-so-far metric (default: global L2, as the reference
        uses for every CW variant, CW_attack.py:129-131).
    """
    b, n, _ = data.shape
    ori = data
    track = track_fn or l2_dist
    opt = optax.adam(cfg.attack_lr)

    def iter_step(carry, _):
        adv, opt_state, best, _last_eval = carry
        (bestdist, bestscore, o_bestdist, o_bestscore, o_bestattack, w) = best

        def total_loss(a):
            lg = model_fn(a)
            return (
                jnp.sum(adv_loss_fn(lg, target) + dist_loss_fn(a, ori) * w),
                lg,
            )

        # one fused forward serves both the best-tracking evaluation and
        # the gradient (the reference reuses its forward the same way,
        # CW_attack.py:115-169)
        (_, logits), grads = jax.value_and_grad(total_loss, has_aux=True)(
            adv
        )
        pred = jnp.argmax(logits, axis=-1)
        dist = track(adv, ori)
        succ = _success(pred, target, cfg.targeted)

        improved = succ & (dist < bestdist)
        bestdist = jnp.where(improved, dist, bestdist)
        bestscore = jnp.where(improved, pred, bestscore)

        o_improved = succ & (dist < o_bestdist)
        o_bestdist = jnp.where(o_improved, dist, o_bestdist)
        o_bestscore = jnp.where(o_improved, pred, o_bestscore)
        o_bestattack = jnp.where(
            o_improved[:, None, None], adv, o_bestattack
        )
        updates, opt_state = opt.update(grads, opt_state, adv)
        adv_new = optax.apply_updates(adv, updates)
        if clip_fn is not None:
            adv_new = jax.lax.stop_gradient(clip_fn(adv_new, ori))

        best = (bestdist, bestscore, o_bestdist, o_bestscore, o_bestattack, w)
        # ``adv`` (pre-step) is the reference's input_val for this
        # iteration — carried so fail back-fill uses the last EVALUATED
        # iterate, exactly like CW_attack.py:133/209.
        return (adv_new, opt_state, best, adv), None

    def binary_step(carry, k):
        lower, upper, weight, o_bestdist, o_bestscore, o_bestattack, last = (
            carry
        )
        noise = (
            jax.random.normal(k, (b, n, 3), dtype=data.dtype)
            * cfg.init_noise_scale
        )
        adv0 = ori + noise
        opt_state = opt.init(adv0)

        best0 = (
            jnp.full((b,), 1e10, dtype=jnp.float32),
            jnp.full((b,), -1, dtype=jnp.int32),
            o_bestdist,
            o_bestscore,
            o_bestattack,
            weight,
        )
        (_, _, best, last_eval), _ = jax.lax.scan(
            iter_step, (adv0, opt_state, best0, adv0), None,
            length=cfg.num_iter,
        )
        bestdist, bestscore, o_bestdist, o_bestscore, o_bestattack, _ = best

        round_success = (
            (bestscore != -1)
            & _success(bestscore, target, cfg.targeted)
            & (bestdist <= o_bestdist)
        )
        lower = jnp.where(round_success, jnp.maximum(lower, weight), lower)
        upper = jnp.where(round_success, upper, jnp.minimum(upper, weight))
        weight = (lower + upper) / 2.0

        return (
            lower,
            upper,
            weight,
            o_bestdist,
            o_bestscore,
            o_bestattack,
            last_eval,
        ), None

    init = (
        jnp.zeros((b,), dtype=jnp.float32),  # lower
        jnp.full((b,), cfg.max_weight, dtype=jnp.float32),  # upper
        jnp.full((b,), cfg.init_weight, dtype=jnp.float32),  # weight
        jnp.full((b,), 1e10, dtype=jnp.float32),  # o_bestdist
        jnp.full((b,), -1, dtype=jnp.int32),  # o_bestscore
        jnp.zeros_like(data),  # o_bestattack
        data,  # last evaluated adv
    )
    keys = jax.random.split(key, cfg.binary_step)
    (lower, _, _, o_bestdist, o_bestscore, o_bestattack, last), _ = (
        jax.lax.scan(binary_step, init, keys)
    )

    # Back-fill failures with the last iterate (CW_attack.py:206-209).
    failed = lower == 0.0
    o_bestattack = jnp.where(failed[:, None, None], last, o_bestattack)

    final_logits = model_fn(o_bestattack)
    final_pred = jnp.argmax(final_logits, axis=-1)
    success = _success(final_pred, target, cfg.targeted)

    return CWResult(
        best_dist=o_bestdist,
        best_attack=o_bestattack,
        best_score=o_bestscore,
        success=success,
        final_pred=final_pred,
    )


def make_cw_attack_fn(
    model_fn: ModelFn,
    cfg: CWConfig,
    adv_loss_fn: AdvLossFn,
    dist_loss_fn: DistLossFn,
    clip_fn: ClipFn | None = None,
    track_fn: TrackFn | None = None,
):
    """Compiled (data, target, key) -> CWResult attack function."""

    @jax.jit
    def run(data, target, key):
        return cw_attack(
            model_fn,
            data,
            target,
            key,
            cfg,
            adv_loss_fn,
            dist_loss_fn,
            clip_fn,
            track_fn,
        )

    return run


def shuffle_check(
    model_fn: ModelFn,
    adv: jax.Array,
    target: jax.Array,
    key: jax.Array,
    targeted: bool = False,
) -> jax.Array:
    """Re-classify with randomly permuted points (CW_attack.py:226-241).

    Returns [B] bool: attack still succeeds after shuffling.
    """
    n = adv.shape[1]
    perm = jax.random.permutation(key, n)
    pred = jnp.argmax(model_fn(adv[:, perm, :]), axis=-1)
    return _success(pred, target, targeted)


def transfer_check(
    trans_model_fn: ModelFn,
    adv: jax.Array,
    target: jax.Array,
    targeted: bool = False,
) -> jax.Array:
    """Re-classify on a different victim (CW_attack.py:244-257)."""
    pred = jnp.argmax(trans_model_fn(adv), axis=-1)
    return _success(pred, target, targeted)
