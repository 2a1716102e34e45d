"""Robust-CW variant with EOT-style input transforms.

Behavioral twin of reference attack/additional_exp/CW_attack.py:12-321 —
the plain CW loop extended with five toggles:
  * whether_1d: perturb the z coordinate only — after every optimizer
    step x/y are reset to the original and z is box-clipped to
    ±box_constraint (0.4) around the original (:16,44,268-275; the
    reference's DEFAULT mode);
  * renormalization: re-center + unit-sphere scale before each forward
    (:110-118);
  * 3Dtransform: average the adversarial loss over 10 random small
    rotations of the clean cloud plus the current perturbation —
    expectation-over-transformation (:195-252);
  * resample: duplicate the cloud and take a random half before the
    forward (:237-241);
  * best tracking uses the DIST FUNC value (not plain L2) (:150-180).

TPU re-design: the 10 EOT branches run as one batched forward of shape
[T*B, N, 3] instead of a host loop of 10 forwards.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from pointcloudattack_tpu.losses.adv import (
    logits_adv_loss,
    untargeted_logits_adv_loss,
)
from pointcloudattack_tpu.losses.distance import l2_dist


@dataclasses.dataclass(frozen=True)
class RobustCWConfig:
    attack_lr: float = 1e-2
    init_weight: float = 10.0
    max_weight: float = 80.0
    binary_step: int = 10
    num_iter: int = 500
    targeted: bool = True  # reference default whether_target=True
    kappa: float = 30.0
    whether_1d: bool = True  # reference default whether_1d=True (:16)
    box_constraint: float = 0.4  # z box half-width in 1d mode (:44)
    renormalization: bool = False
    transform_eot: bool = False
    num_eot: int = 10
    eot_sigma: float = 1e-2  # rotation angle scale (:198)
    resample: bool = False
    init_noise_scale: float = 1e-7


def _renormalize(pc: jax.Array) -> jax.Array:
    centered = pc - jnp.mean(pc, axis=1, keepdims=True)
    scale = jnp.max(
        jnp.linalg.norm(centered, axis=-1), axis=1, keepdims=True
    )
    return centered / (scale[..., None] + 1e-12)


def _axis_rotations(key: jax.Array, t: int, sigma: float) -> jax.Array:
    """[T, 3, 3] random small single-axis rotations (or identity).

    Mirrors :196-224: theta ~ N(0, sigma); axis chosen z/x/y/none with
    probabilities .2/.2/.2/.4.
    """
    k_theta, k_axis = jax.random.split(key)
    theta = jax.random.normal(k_theta, (t,)) * sigma
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    rz = jnp.stack(
        [c, s, zero, -s, c, zero, zero, zero, one], axis=-1
    ).reshape(t, 3, 3)
    rx = jnp.stack(
        [one, zero, zero, zero, c, s, zero, -s, c], axis=-1
    ).reshape(t, 3, 3)
    ry = jnp.stack(
        [c, zero, s, zero, one, zero, -s, zero, c], axis=-1
    ).reshape(t, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), (t, 3, 3))
    r = jax.random.uniform(k_axis, (t,))
    sel = jnp.select(
        [r < 0.2, r < 0.4, r < 0.6],
        [jnp.zeros_like(r, dtype=jnp.int32),
         jnp.ones_like(r, dtype=jnp.int32),
         jnp.full_like(r, 2, dtype=jnp.int32)],
        jnp.full_like(r, 3, dtype=jnp.int32),
    )
    stack = jnp.stack([rz, rx, ry, eye], axis=0)  # [4, T, 3, 3]
    return jnp.take_along_axis(
        stack, sel[None, :, None, None], axis=0
    )[0]


def build_robust_cw_attack(model_fn, dist_fn, cfg: RobustCWConfig):
    """Compiled (data, target, key) -> (adv, best_dist, success).

    dist_fn: (adv, ori) -> [B]; also the best-tracking metric.
    """
    opt = optax.adam(cfg.attack_lr)
    adv_fn = (
        (lambda lg, t: logits_adv_loss(lg, t, cfg.kappa))
        if cfg.targeted
        else (lambda lg, t: untargeted_logits_adv_loss(lg, t, cfg.kappa))
    )

    def success(pred, target):
        return pred == target if cfg.targeted else pred != target

    @jax.jit
    def run(data, target, key):
        b, n, _ = data.shape
        ori = data

        def model_view(adv, k):
            """Apply the configured input transforms, return logits."""
            if cfg.transform_eot:
                rots = _axis_rotations(k, cfg.num_eot, cfg.eot_sigma)
                diff = adv - ori
                # rotate the CLEAN cloud, keep the perturbation (:224)
                rotated = (
                    jnp.einsum("tij,bnj->tbni", rots, ori) + diff[None]
                )
                views = rotated.reshape(cfg.num_eot * b, n, 3)
            else:
                views = adv
            if cfg.renormalization:
                views = _renormalize(views)
            if cfg.resample:
                doubled = jnp.concatenate([views, views], axis=1)
                idx = jax.random.permutation(
                    jax.random.fold_in(k, 1), 2 * n
                )[:n]
                views = doubled[:, idx, :]
            lg = model_fn(views)
            if cfg.transform_eot:
                lg = lg.reshape(cfg.num_eot, b, -1)
            return lg

        def iter_step(carry, k):
            adv, opt_state, best, _last_eval = carry
            bestdist, bestscore, o_bestdist, o_bestscore, o_bestattack, w = (
                best
            )

            plain_logits = model_fn(
                _renormalize(adv) if cfg.renormalization else adv
            )
            pred = jnp.argmax(plain_logits, axis=-1)
            dist = dist_fn(adv, ori)  # tracking metric (:150-180)
            succ = success(pred, target)

            improved = succ & (dist < bestdist)
            bestdist = jnp.where(improved, dist, bestdist)
            bestscore = jnp.where(improved, pred, bestscore)
            o_improved = succ & (dist < o_bestdist)
            o_bestdist = jnp.where(o_improved, dist, o_bestdist)
            o_bestscore = jnp.where(o_improved, pred, o_bestscore)
            o_bestattack = jnp.where(
                o_improved[:, None, None], adv, o_bestattack
            )

            def total_loss(a):
                lg = model_view(a, k)
                if cfg.transform_eot:
                    al = jnp.mean(
                        jax.vmap(lambda l: adv_fn(l, target))(lg), axis=0
                    )
                else:
                    al = adv_fn(lg, target)
                return jnp.sum(al + dist_fn(a, ori) * w)

            grads = jax.grad(total_loss)(adv)
            pre_step_adv = adv
            updates, opt_state = opt.update(grads, opt_state, adv)
            adv = optax.apply_updates(adv, updates)
            if cfg.whether_1d:
                # z-only attack: restore x/y, box-clip z (:268-275)
                z = jnp.clip(
                    adv[..., 2],
                    ori[..., 2] - cfg.box_constraint,
                    ori[..., 2] + cfg.box_constraint,
                )
                adv = jnp.concatenate([ori[..., :2], z[..., None]], axis=-1)

            best = (bestdist, bestscore, o_bestdist, o_bestscore,
                    o_bestattack, w)
            # pre-step iterate carried for reference-exact fail back-fill
            return (adv, opt_state, best, pre_step_adv), None

        def binary_round(carry, k):
            lower, upper, weight, o_bestdist, o_bestscore, o_bestattack, \
                last = carry
            k_init, k_iter = jax.random.split(k)
            adv0 = ori + (
                jax.random.normal(k_init, ori.shape, dtype=ori.dtype)
                * cfg.init_noise_scale
            )
            best0 = (
                jnp.full((b,), 1e10, dtype=jnp.float32),
                jnp.full((b,), -1, dtype=jnp.int32),
                o_bestdist, o_bestscore, o_bestattack, weight,
            )
            (adv, _, best, last_eval), _ = jax.lax.scan(
                iter_step,
                (adv0, opt.init(adv0), best0, adv0),
                jax.random.split(k_iter, cfg.num_iter),
            )
            bestdist, bestscore, o_bestdist, o_bestscore, o_bestattack, _ = (
                best
            )
            ok = (
                (bestscore != -1)
                & success(bestscore, target)
                & (bestdist <= o_bestdist)
            )
            lower = jnp.where(ok, jnp.maximum(lower, weight), lower)
            upper = jnp.where(ok, upper, jnp.minimum(upper, weight))
            weight = (lower + upper) / 2.0
            return (
                lower, upper, weight, o_bestdist, o_bestscore,
                o_bestattack, last_eval,
            ), None

        init = (
            jnp.zeros((b,), dtype=jnp.float32),
            jnp.full((b,), cfg.max_weight, dtype=jnp.float32),
            jnp.full((b,), cfg.init_weight, dtype=jnp.float32),
            jnp.full((b,), 1e10, dtype=jnp.float32),
            jnp.full((b,), -1, dtype=jnp.int32),
            jnp.zeros_like(data),
            data,
        )
        (lower, _, _, o_bestdist, _, o_bestattack, last), _ = jax.lax.scan(
            binary_round, init, jax.random.split(key, cfg.binary_step)
        )
        failed = lower == 0.0
        adv = jnp.where(failed[:, None, None], last, o_bestattack)
        final_view = _renormalize(adv) if cfg.renormalization else adv
        pred = jnp.argmax(model_fn(final_view), axis=-1)
        return adv, o_bestdist, success(pred, target)

    return run
