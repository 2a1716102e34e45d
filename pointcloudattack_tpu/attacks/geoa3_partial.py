"""GeoA3 partial-variable mode: attack one kNN patch at a time.

Behavioral twin of the reference's ``is_partial_var`` path
(attack/GeoA3/GeoA3_attack.py:259-300): every ``refresh_iters`` (50)
iterations a random seed point is drawn, its ``knn_range``-nearest
neighbourhood in the CLEAN cloud becomes the only optimized offsets
(zero elsewhere), the optimizer restarts, and the accumulated cloud so
far becomes the new base ("periodical_pc").  The reference also supports
``is_subsample_opt`` (evaluate/optimize on an FPS subsample when N >
npoint, GeoA3_attack.py:303-306) — exposed here as ``subsample_npoint``.

TPU re-design: the patch refresh is a ``lax.cond`` inside the scan; the
patch offsets live as a dense [B, N, 3] buffer masked by the patch
one-hot, so shapes stay static and the optimizer state reset is a
tree-map to zeros.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from pointcloudattack_tpu.attacks.geoa3 import (
    GeoA3Config,
    _constraint_loss,
    _make_cls_fn,
)
from pointcloudattack_tpu.geometry.normals import estimate_normal
from pointcloudattack_tpu.losses.geometry import kappa_ori, self_knn_idx
from pointcloudattack_tpu.ops.fps import farthest_point_sample
from pointcloudattack_tpu.ops.gather import index_points
from pointcloudattack_tpu.ops.knn import knn_points


@dataclasses.dataclass(frozen=True)
class GeoA3PartialConfig(GeoA3Config):
    knn_range: int = 16
    refresh_iters: int = 50
    subsample_npoint: int = 0  # 0 = no FPS subsample during eval


def build_geoa3_partial_attack(model_fn, cfg: GeoA3PartialConfig):
    """Compiled (data, target, key) -> (adv, best_loss, success).

    ``cls_loss_type`` Margin/CE/None applies exactly as in full mode
    (the reference's ``_forward_step``, GeoA3_attack.py:103-183, is
    shared by both).  ``curv_knn_refresh > 1`` caches the curvature
    self-kNN index set in the scan carry and refreshes it by
    ``lax.cond`` every R iterations — unlike the full loop's nested
    period scans (the patch refresh already forces a per-iteration
    ``lax.cond``, so restructuring buys nothing here).
    """
    if cfg.curv_knn_refresh < 1:
        raise ValueError(
            f"curv_knn_refresh must be >= 1, got {cfg.curv_knn_refresh}"
        )
    cache_knn = cfg.curv_loss_weight != 0 and cfg.curv_knn_refresh > 1
    cls_fn = _make_cls_fn(cfg)
    opt = optax.adam(cfg.lr)

    @jax.jit
    def run(data, target, key):
        b, n, _ = data.shape
        ori = data
        normal_ori = estimate_normal(ori, k=cfg.normal_k)
        k_ori = (
            kappa_ori(ori, normal_ori, cfg.curv_loss_knn)
            if cfg.curv_loss_weight != 0
            else jnp.zeros((b, n), dtype=ori.dtype)
        )

        def fresh_patch(k, base):
            """New random patch mask + tiny offset init."""
            k_pt, k_off = jax.random.split(k)
            seed_idx = jax.random.randint(k_pt, (b,), 0, n)
            seed_xyz = jnp.take_along_axis(
                ori, seed_idx[:, None, None], axis=1
            )  # [B, 1, 3]
            _, idx = knn_points(seed_xyz, ori, k=cfg.knn_range)
            mask = (
                jax.nn.one_hot(idx[:, 0, :], n, dtype=ori.dtype)
                .sum(axis=1)
                .clip(0, 1)[..., None]
            )  # [B, N, 1]
            offset = (
                jax.random.normal(k_off, ori.shape, dtype=ori.dtype) * 1e-3
            ) * mask
            return mask, offset, base

        def make_iter_step(weight, k_patch):
            def iter_step(carry, inputs):
                it, k_it = inputs
                (offset, mask, base, opt_state, prev_cons, best,
                 curv_idx) = carry
                best_loss, best_attack = best

                def refresh(args):
                    offset, mask, base, opt_state = args
                    new_mask, new_offset, new_base = fresh_patch(
                        jax.random.fold_in(k_patch, it), base + offset
                    )
                    return (
                        new_offset,
                        new_mask,
                        new_base,
                        jax.tree_util.tree_map(
                            jnp.zeros_like, opt_state
                        ),
                    )

                offset, mask, base, opt_state = jax.lax.cond(
                    it % cfg.refresh_iters == 0,
                    refresh,
                    lambda a: a,
                    (offset, mask, base, opt_state),
                )

                adv = base + offset * mask

                if cache_knn:
                    # refresh sees the same pre-step adv the loss
                    # forward sees (full-mode period-boundary twin)
                    curv_idx = jax.lax.cond(
                        it % cfg.curv_knn_refresh == 0,
                        lambda: self_knn_idx(adv, cfg.curv_loss_knn),
                        lambda: curv_idx,
                    )

                def loss_fn(off):
                    a = base + off * mask
                    lg = model_fn(a)
                    cons = _constraint_loss(
                        a, ori, normal_ori, k_ori, cfg,
                        self_idx=curv_idx if cache_knn else None,
                    )
                    return (
                        jnp.sum(cls_fn(lg, target) + weight * cons),
                        (cons, lg),
                    )

                (_, (cons, logits)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(offset)

                # eval (optionally on an FPS subsample, :303-306); without
                # the subsample the eval input equals the loss forward's,
                # so its logits are the aux output — one pass, not two
                if cfg.subsample_npoint and cfg.subsample_npoint < n:
                    sub_idx = farthest_point_sample(
                        adv, cfg.subsample_npoint, key=None
                    )
                    logits = model_fn(index_points(adv, sub_idx))
                pred = jnp.argmax(logits, axis=-1)
                succ = pred == target if cfg.targeted else pred != target
                improved = succ & (prev_cons < best_loss)
                best_loss = jnp.where(improved, prev_cons, best_loss)
                best_attack = jnp.where(
                    improved[:, None, None], adv, best_attack
                )
                updates, opt_state = opt.update(grads, opt_state, offset)
                offset = optax.apply_updates(offset, updates) * mask

                return (
                    offset, mask, base, opt_state, cons,
                    (best_loss, best_attack), curv_idx,
                ), None

            return iter_step

        def binary_round(carry, k):
            lower, upper, const, best_loss, best_attack = carry
            k_patch, k_iter = jax.random.split(k)
            offset0 = jnp.zeros_like(ori)
            mask0 = jnp.zeros((b, n, 1), dtype=ori.dtype)
            its = jnp.arange(cfg.iter_max_steps)
            curv_idx0 = (
                jnp.zeros((b, n, cfg.curv_loss_knn), dtype=jnp.int32)
                if cache_knn
                else jnp.zeros((b,), dtype=jnp.int32)  # unused stub
            )
            (offset, mask, base, _, _, best, _), _ = jax.lax.scan(
                make_iter_step(const, k_patch),
                (
                    offset0, mask0, ori, opt.init(offset0),
                    jnp.full((b,), 1e10, dtype=jnp.float32),
                    (best_loss, best_attack), curv_idx0,
                ),
                (its, jax.random.split(k_iter, cfg.iter_max_steps)),
            )
            best_loss, best_attack = best

            adv = base + offset * mask
            pred = jnp.argmax(model_fn(adv), axis=-1)
            succ = pred == target if cfg.targeted else pred != target
            lower = jnp.where(succ, jnp.maximum(lower, const), lower)
            upper = jnp.where(succ, upper, jnp.minimum(upper, const))
            bounded = upper < 1e9
            const = jnp.where(
                succ,
                jnp.where(bounded, (lower + upper) * 0.5, const * 2.0),
                jnp.where(bounded, (lower + upper) * 0.5, const),
            )
            return (lower, upper, const, best_loss, best_attack), None

        carry = (
            jnp.zeros((b,), dtype=jnp.float32),
            jnp.full((b,), 1e10, dtype=jnp.float32),
            jnp.full((b,), cfg.initial_const, dtype=jnp.float32),
            jnp.full((b,), 1e10, dtype=jnp.float32),
            jnp.broadcast_to(ori, ori.shape),
        )
        # same per-round keys as the old unrolled loop (fold_in by index),
        # but scanned so the HLO carries one round only
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(cfg.binary_max_steps)
        )
        carry, _ = jax.lax.scan(binary_round, carry, keys)
        _, _, _, best_loss, best_attack = carry
        pred = jnp.argmax(model_fn(best_attack), axis=-1)
        success = pred == target if cfg.targeted else pred != target
        return best_attack, best_loss, success

    return run
