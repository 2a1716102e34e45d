"""Gen3DAdv (CVPR'19) attacks: perturb / add-points / add-clusters.

Behavioral twins of reference attack/Gen3DAdv/:
  * Perturb_attack.py is structurally identical to attack/CW/CW_attack.py
    — use :mod:`pointcloudattack_tpu.attacks.cw` directly;
  * IndpAdd_attack.py:15-289 seeds ``num_add`` new points at the
    gradient-magnitude critical points and binary-searches a CW loss over
    ONLY the added points (the clean cloud is frozen);
  * ClusterAdd_attack.py:81-288 instead seeds ``num_add`` DBSCAN clusters
    of critical points (host-side init; the reference uses sklearn's
    DBSCAN — a small numpy DBSCAN here keeps the image dependency-free).

The optimization engine mirrors attacks/engine.py but the variable is the
added-point tensor; best tracking uses the attack family's distance on
(added, ori) with the reference's weight schedules
(IndpAdd: init 5e3 / max 4e4; ClusterAdd: init 5 / max 30 / 5 rounds).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloudattack_tpu.losses.adv import (
    logits_adv_loss,
    untargeted_logits_adv_loss,
)
from pointcloudattack_tpu.losses.distance import (
    chamfer_dist,
    far_chamfer_dist,
)


def get_critical_points(
    model_fn: Callable, pc: jax.Array, label: jax.Array, num: int
) -> jax.Array:
    """Top-``num`` points by squared input-gradient norm of the CE loss.

    Reference IndpAdd_attack.py:15-42 (uses F.cross_entropy on the model
    output; our models emit log-probs so NLL is identical).
    """

    def loss(x):
        lg = model_fn(x)
        one_hot = jax.nn.one_hot(label, lg.shape[-1], dtype=lg.dtype)
        logp = jax.nn.log_softmax(lg, axis=-1)
        return -jnp.mean(jnp.sum(one_hot * logp, axis=-1))

    grad = jax.grad(loss)(pc)  # [B, N, 3]
    score = jnp.sum(grad**2, axis=-1)  # [B, N]
    n = pc.shape[1]
    k = min(num, n)
    _, idx = jax.lax.top_k(score, k)
    if k < num:
        # fewer points than requested seeds: cycle the ranked indices
        reps = jnp.arange(num) % k
        idx = jnp.take_along_axis(idx, reps[None, :].repeat(len(idx), 0), 1)
    return jnp.take_along_axis(pc, idx[..., None], axis=1)  # [B, num, 3]


def dbscan_numpy(points: np.ndarray, eps: float, min_samples: int):
    """Minimal DBSCAN on [N, 3] numpy points. Returns labels (-1 = noise)."""
    n = len(points)
    d2 = ((points[:, None] - points[None]) ** 2).sum(-1)
    neighbours = d2 <= eps * eps
    counts = neighbours.sum(1)
    core = counts >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS over density-reachable points
        stack, labels[i] = [i], cluster
        while stack:
            j = stack.pop()
            if not core[j]:
                continue
            for m in np.where(neighbours[j])[0]:
                if labels[m] == -1:
                    labels[m] = cluster
                    stack.append(m)
        cluster += 1
    return labels


@dataclasses.dataclass(frozen=True)
class AddPointsConfig:
    """IndpAdd_attack.py:49-56 defaults."""

    attack_lr: float = 1e-2
    init_weight: float = 5e3
    max_weight: float = 4e4
    binary_step: int = 10
    num_iter: int = 500
    num_add: int = 512
    targeted: bool = False
    kappa: float = 30.0
    chamfer_weight: float = 0.1  # FarChamferDist mixing (unused here)
    init_noise_scale: float = 1e-7


@dataclasses.dataclass(frozen=True)
class AddClustersConfig:
    """ClusterAdd_attack.py:46-60 defaults."""

    attack_lr: float = 1e-2
    init_weight: float = 5.0
    max_weight: float = 30.0
    binary_step: int = 5
    num_iter: int = 500
    num_add: int = 3
    cl_num_p: int = 32
    num_critical: int = 128
    dbscan_eps: float = 0.2
    dbscan_min: int = 3
    targeted: bool = False
    kappa: float = 30.0
    init_noise_scale: float = 1e-7


def init_cluster_seeds(
    model_fn, pc: jax.Array, label: jax.Array, cfg: AddClustersConfig,
    seed: int = 0,
) -> jax.Array:
    """DBSCAN the critical points into cluster seeds, [B, A*P, 3].

    Host-side twin of ClusterAdd_attack.py:81-127.
    """
    cri = np.asarray(
        get_critical_points(model_fn, pc, label, cfg.num_critical)
    )
    rng = np.random.RandomState(seed)
    out = []
    for b in range(len(cri)):
        points = cri[b]
        labels = dbscan_numpy(points, cfg.dbscan_eps, cfg.dbscan_min)
        keep = labels >= 0
        lab, pts = labels[keep], points[keep]
        uniq, counts = np.unique(lab, return_counts=True)
        chosen = uniq[np.argsort(counts)[-cfg.num_add :]]
        clusters = []
        for c in chosen:
            members = pts[lab == c]
            replace = len(members) <= cfg.cl_num_p
            sel = rng.choice(len(members), cfg.cl_num_p, replace=replace)
            clusters.append(members[sel])
        while len(clusters) < cfg.num_add:
            anchor = points[rng.choice(len(points))]
            d = ((points - anchor) ** 2).sum(-1)
            clusters.append(points[np.argsort(d)[: cfg.cl_num_p]])
        out.append(np.stack(clusters))  # [A, P, 3]
    arr = np.stack(out).astype(np.float32)
    return jnp.asarray(arr.reshape(len(cri), -1, 3))


def _added_points_attack(
    model_fn,
    ori: jax.Array,
    target: jax.Array,
    seeds: jax.Array,
    key: jax.Array,
    *,
    attack_lr,
    init_weight,
    max_weight,
    binary_step,
    num_iter,
    targeted,
    kappa,
    noise_scale,
    dist_fn,
):
    """Shared binary-search loop optimizing only the added points."""
    b = ori.shape[0]
    opt = optax.adam(attack_lr)
    adv_fn = (
        (lambda lg, t: logits_adv_loss(lg, t, kappa))
        if targeted
        else (lambda lg, t: untargeted_logits_adv_loss(lg, t, kappa))
    )

    def success(pred):
        return pred == target if targeted else pred != target

    def iter_step(carry, _):
        added, opt_state, best, _last_eval = carry
        bestdist, bestscore, o_bestdist, o_bestscore, o_bestadded, w = best

        full = jnp.concatenate([ori, added], axis=1)
        pred = jnp.argmax(model_fn(full), axis=-1)
        dist = dist_fn(added, ori)
        succ = success(pred)

        improved = succ & (dist < bestdist)
        bestdist = jnp.where(improved, dist, bestdist)
        bestscore = jnp.where(improved, pred, bestscore)
        o_improved = succ & (dist < o_bestdist)
        o_bestdist = jnp.where(o_improved, dist, o_bestdist)
        o_bestscore = jnp.where(o_improved, pred, o_bestscore)
        o_bestadded = jnp.where(o_improved[:, None, None], added, o_bestadded)

        def total_loss(a):
            lg = model_fn(jnp.concatenate([ori, a], axis=1))
            return jnp.sum(adv_fn(lg, target) + dist_fn(a, ori) * w)

        grads = jax.grad(total_loss)(added)
        pre_step = added
        updates, opt_state = opt.update(grads, opt_state, added)
        added = optax.apply_updates(added, updates)

        best = (bestdist, bestscore, o_bestdist, o_bestscore, o_bestadded, w)
        # pre-step iterate carried for reference-exact fail back-fill
        return (added, opt_state, best, pre_step), None

    def binary_round(carry, k):
        lower, upper, weight, o_bestdist, o_bestscore, o_bestadded, last = (
            carry
        )
        added0 = seeds + (
            jax.random.normal(k, seeds.shape, dtype=seeds.dtype) * noise_scale
        )
        best0 = (
            jnp.full((b,), 1e10, dtype=jnp.float32),
            jnp.full((b,), -1, dtype=jnp.int32),
            o_bestdist,
            o_bestscore,
            o_bestadded,
            weight,
        )
        (added, _, best, last_eval), _ = jax.lax.scan(
            iter_step, (added0, opt.init(added0), best0, added0), None,
            length=num_iter,
        )
        bestdist, bestscore, o_bestdist, o_bestscore, o_bestadded, _ = best

        ok = (bestscore != -1) & success(bestscore) & (bestdist <= o_bestdist)
        lower = jnp.where(ok, jnp.maximum(lower, weight), lower)
        upper = jnp.where(ok, upper, jnp.minimum(upper, weight))
        weight = (lower + upper) / 2.0
        return (
            lower, upper, weight, o_bestdist, o_bestscore, o_bestadded,
            last_eval,
        ), None

    init = (
        jnp.zeros((b,), dtype=jnp.float32),
        jnp.full((b,), max_weight, dtype=jnp.float32),
        jnp.full((b,), init_weight, dtype=jnp.float32),
        jnp.full((b,), 1e10, dtype=jnp.float32),
        jnp.full((b,), -1, dtype=jnp.int32),
        jnp.zeros_like(seeds),
        seeds,
    )
    keys = jax.random.split(key, binary_step)
    (lower, _, _, o_bestdist, _, o_bestadded, last), _ = jax.lax.scan(
        binary_round, init, keys
    )
    failed = lower == 0.0
    added = jnp.where(failed[:, None, None], last, o_bestadded)
    full = jnp.concatenate([ori, added], axis=1)
    pred = jnp.argmax(model_fn(full), axis=-1)
    return full, added, o_bestdist, success(pred)


def build_add_points_attack(model_fn, cfg: AddPointsConfig):
    """Compiled (data [B,N,3], target [B], key) ->
    (full_cloud, added, best_dist, success)."""

    @jax.jit
    def run(data, target, key):
        seeds = get_critical_points(model_fn, data, target, cfg.num_add)
        return _added_points_attack(
            model_fn, data, target, seeds, key,
            attack_lr=cfg.attack_lr,
            init_weight=cfg.init_weight,
            max_weight=cfg.max_weight,
            binary_step=cfg.binary_step,
            num_iter=cfg.num_iter,
            targeted=cfg.targeted,
            kappa=cfg.kappa,
            noise_scale=cfg.init_noise_scale,
            dist_fn=lambda a, o: chamfer_dist(a, o),
        )

    return run


def build_add_clusters_attack(model_fn, cfg: AddClustersConfig):
    """(data, target, key) -> (full_cloud, added, best_dist, success).

    Cluster seeding runs on host (DBSCAN); the optimization is jitted.
    """
    dist_fn = lambda a, o: far_chamfer_dist(a, o, cfg.num_add)

    run_opt = jax.jit(
        lambda data, target, seeds, key: _added_points_attack(
            model_fn, data, target, seeds, key,
            attack_lr=cfg.attack_lr,
            init_weight=cfg.init_weight,
            max_weight=cfg.max_weight,
            binary_step=cfg.binary_step,
            num_iter=cfg.num_iter,
            targeted=cfg.targeted,
            kappa=cfg.kappa,
            noise_scale=cfg.init_noise_scale,
            dist_fn=dist_fn,
        )
    )

    def run(data, target, key, seed: int = 0):
        seeds = init_cluster_seeds(model_fn, data, target, cfg, seed)
        return run_opt(data, target, seeds, key)

    return run
