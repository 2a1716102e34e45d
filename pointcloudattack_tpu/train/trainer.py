"""Victim-model training loop.

TPU-native equivalent of reference train.py:139-194: Adam(1e-3) with the
reference's StepLR(20 epochs, gamma .5) schedule, NLL loss on log-prob
models (label-smoothed CE for CurveNet, reference train.py:158-164 /
attack/CW/CW_utils/basic_util.py:17-34), BatchNorm statistics carried as
flax ``batch_stats`` collections, best-accuracy checkpointing via orbax.

The train step is one jitted function; data sharding across a mesh happens
in parallel/ (the step itself is parallelism-agnostic).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference train.py defaults (train.py:44-49, 139-146)."""

    learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    epochs: int = 150
    batch_size: int = 10
    lr_step_epochs: int = 20
    lr_gamma: float = 0.5
    label_smoothing: float = 0.0  # reference uses 0.2 for CurveNet
    output_kind: str = "log_probs"  # or "logits" (CurveNet)
    feature_transform_reg: float = 0.0  # 0.001 when --feature_transform
    task: str = "cls"  # "cls" | "seg" (per-point labels, PointNetDenseCls)


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    k = log_probs.shape[-1]
    one_hot = jax.nn.one_hot(labels, k, dtype=log_probs.dtype)
    return -jnp.mean(jnp.sum(one_hot * log_probs, axis=-1))


def smoothed_ce_loss(
    logits: jax.Array, labels: jax.Array, eps: float = 0.2
) -> jax.Array:
    """Label-smoothed CE (reference basic_util.py:17-34).

    The reference gives the target class exactly 1-eps and spreads eps
    over the K-1 OTHER classes (not eps/K over all K).
    """
    k = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, k, dtype=logits.dtype)
    soft = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (k - 1)
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(soft * log_prb, axis=-1))


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """Adam + StepLR(step_epochs, gamma) exactly like the reference."""
    sched = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=max(1, cfg.lr_step_epochs * steps_per_epoch),
        decay_rate=cfg.lr_gamma,
        staircase=True,
    )
    return optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2)


def make_train_step(model, cfg: TrainConfig, steps_per_epoch: int):
    """Jitted (state, batch, labels, rng) -> (state, metrics)."""
    opt = make_optimizer(cfg, steps_per_epoch)

    def loss_fn(params, batch_stats, x, y, rng):
        (out, aux), new_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        if cfg.task == "seg":
            # out [B, N, K], y [B, N] — flatten like reference
            # train_segmentation's view(-1, num_classes)
            out_flat = out.reshape(-1, out.shape[-1])
            y_flat = y.reshape(-1)
            loss = nll_loss(out_flat, y_flat)
            acc = jnp.mean(jnp.argmax(out_flat, axis=-1) == y_flat)
        else:
            if cfg.output_kind == "logits" or cfg.label_smoothing > 0:
                loss = smoothed_ce_loss(out, y, cfg.label_smoothing)
            else:
                loss = nll_loss(out, y)
            acc = jnp.mean(jnp.argmax(out, axis=-1) == y)
        if cfg.feature_transform_reg > 0 and aux.get("trans_feat") is not None:
            from pointcloudattack_tpu.models.common import (
                feature_transform_regularizer,
            )

            loss = loss + cfg.feature_transform_reg * (
                feature_transform_regularizer(aux["trans_feat"])
            )
        return loss, (new_state["batch_stats"], acc)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y, rng):
        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, x, y, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, {"loss": loss, "acc": acc}

    return train_step


def make_eval_step(model):
    @jax.jit
    def eval_step(params, batch_stats, x, y):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return jnp.argmax(out, axis=-1) == y

    return eval_step


def fit(
    model,
    variables: dict,
    cfg: TrainConfig,
    train_data: np.ndarray,
    train_labels: np.ndarray,
    *,
    seed: int = 0,
    eval_data: np.ndarray | None = None,
    eval_labels: np.ndarray | None = None,
    log_fn: Callable[[str], None] | None = None,
    mesh=None,
) -> dict:
    """Host-loop fit; returns final variables dict.

    The loop is the moral twin of reference train.py's epoch loop
    (train.py:146-194).  Pass ``mesh`` (a 1-D "data" Mesh, see
    parallel/mesh.py) to run data-parallel: params/opt state are
    replicated, every batch is sharded over the mesh's data axis, and
    XLA inserts the gradient psum from the sharding annotations — the
    step function itself is unchanged.  Batch selection uses the same
    host RNG either way, so sharded and single-device runs see
    identical batches (results match up to cross-shard reduction
    order).  ``parallel.driver.run_sharded_training`` wraps this.
    """
    import contextlib

    num = len(train_labels)
    bs = min(cfg.batch_size, num)
    steps_per_epoch = max(1, num // bs)
    train_step = make_train_step(model, cfg, steps_per_epoch)
    eval_step = make_eval_step(model)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt = make_optimizer(cfg, steps_per_epoch)
    opt_state = opt.init(params)

    data_sh = None
    if mesh is not None:
        from pointcloudattack_tpu.parallel.mesh import (
            batch_sharding,
            replicated,
        )

        n_dev = mesh.devices.size
        if bs % n_dev:
            raise ValueError(
                f"batch_size {bs} not divisible by mesh size {n_dev}"
            )
        data_sh = batch_sharding(mesh)
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        batch_stats = jax.device_put(batch_stats, repl)
        opt_state = jax.device_put(opt_state, repl)

    def put(a):
        a = jnp.asarray(a)
        return jax.device_put(a, data_sh) if data_sh is not None else a

    ctx = mesh if mesh is not None else contextlib.nullcontext()

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    best_acc, best = -1.0, None
    for epoch in range(cfg.epochs):
        order = rng.permutation(num)
        for i in range(steps_per_epoch):
            idx = order[i * bs : (i + 1) * bs]
            key, sub = jax.random.split(key)
            with ctx:
                params, batch_stats, opt_state, metrics = train_step(
                    params, batch_stats, opt_state,
                    put(train_data[idx]),
                    put(train_labels[idx]),
                    sub,
                )
        if eval_data is not None:
            correct = []
            for j in range(0, len(eval_labels), bs):
                # shard eval batches over the mesh too (tail batches
                # that don't divide the mesh stay replicated)
                xb = jnp.asarray(eval_data[j : j + bs])
                yb = jnp.asarray(eval_labels[j : j + bs])
                if data_sh is not None and len(yb) % mesh.devices.size == 0:
                    xb = jax.device_put(xb, data_sh)
                    yb = jax.device_put(yb, data_sh)
                with ctx:
                    batch_correct = eval_step(params, batch_stats, xb, yb)
                correct.append(np.asarray(batch_correct))
            acc = float(np.concatenate(correct).mean())
            if acc > best_acc:
                best_acc = acc
                best = jax.tree_util.tree_map(
                    lambda a: a, {"params": params, "batch_stats": batch_stats}
                )
            if log_fn:
                log_fn(
                    f"epoch {epoch}: loss={float(metrics['loss']):.4f} "
                    f"train_acc={float(metrics['acc']):.3f} eval_acc={acc:.3f}"
                )
    if best is not None:
        return best
    return {"params": params, "batch_stats": batch_stats}
