"""Command-line entry points: train / test / attack / make-splits /
test-advdata.

One CLI replaces the reference's scattered scripts:
  * ``train``        -> reference train.py
  * ``test``         -> reference test.py
  * ``attack ...``   -> reference attack/*/Eval_*.py (one subcommand per
                        family, same flags and output artifacts: txt adv
                        dumps, npz result bundles, CSV logs)
  * ``make-splits``  -> reference get_dataset_csv.py
  * ``test-advdata`` -> reference Test_AdvData.py (whose import was broken
                        upstream, SURVEY.md §5 "latent defects")

Run as ``python -m pointcloudattack_tpu.cli <subcommand> ...``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from pointcloudattack_tpu.utils.config import (
    RunConfig,
    add_common_args,
    run_config_from_args,
)


def _load_dataset(cfg: RunConfig, split: str = "train"):
    """Returns (clouds [M,N,3] generator-compatible dataset, num_classes)."""
    from pointcloudattack_tpu import data as D

    if cfg.dataset == "synthetic":
        num_classes = cfg.num_classes or 10
        clouds, labels = D.make_synthetic_clouds(
            num_classes, 16, cfg.num_points, seed=cfg.seed
        )

        class _ListDS:
            num_classes_ = num_classes

            def __len__(self):
                return len(labels)

            def __getitem__(self, i):
                return clouds[i], int(labels[i])

        ds = _ListDS()
        return ds, num_classes
    if cfg.dataset == "Bosphorus":
        ds = D.BosphorusDataset(cfg.dataset_path, num_points=cfg.num_points)
        return ds, cfg.num_classes or ds.num_classes
    if cfg.dataset == "Eurecom":
        ds = D.EurecomDataset(cfg.dataset_path, num_points=cfg.num_points)
        return ds, cfg.num_classes or ds.num_classes
    if cfg.dataset == "ModelNet":
        ds = D.ModelNetDataset(
            cfg.dataset_path, split=split, num_points=cfg.num_points,
            data_augmentation=(split == "train"),
        )
        return ds, cfg.num_classes or ds.num_classes
    if cfg.dataset == "ShapeNet":
        ds = D.ShapeNetDataset(
            cfg.dataset_path, split=split, num_points=cfg.num_points,
            classification=True,
            data_augmentation=(split == "train"),
        )
        return ds, cfg.num_classes or ds.num_classes
    raise SystemExit(f"unknown dataset {cfg.dataset!r}")


def _build_model(cfg: RunConfig, num_classes: int):
    import jax

    from pointcloudattack_tpu import models

    kw = {}
    if cfg.model == "DGCNN":
        kw = {"k": cfg.k, "emb_dims": cfg.emb_dims, "dropout": cfg.dropout,
              "gather_mode": cfg.gather_mode}
    if cfg.model == "PointNet":
        kw = {"feature_transform": cfg.feature_transform}
    model = models.make_model(cfg.model, num_classes, **kw)
    variables = models.init_model(
        model, jax.random.PRNGKey(cfg.seed), num_points=cfg.num_points,
        batch=2,
    )
    return model, variables


def _restore(cfg: RunConfig, model_name: str, path: str, variables):
    """Restore from an orbax dir or port a torch .pth."""
    if not path:
        return variables
    if path.endswith(".pth") or path.endswith(".pt"):
        from pointcloudattack_tpu.train.torch_port import port_checkpoint

        return port_checkpoint(model_name, path)
    from pointcloudattack_tpu.train.checkpoint import restore_checkpoint

    return restore_checkpoint(path, like=variables)


def _load_dup_variables(path: str, npoint: int) -> dict:
    """Trained PU-Net upsampler weights for ``--defense dupnet``.

    The reference hard-loads its shipped trained upsampler
    (attack/SIadv/baselines/defense/DUP_Net/DUP_Net.py:24,
    ``pu-in_1024-up_4.pth``); a randomly initialized upsampler does not
    defend, so the CLI refuses to run dupnet without weights.  Accepts
    the reference ``.pth`` (via ``port_punet``) or an orbax/npz dir of
    PUNet variables.
    """
    if not path:
        raise SystemExit(
            "--defense dupnet requires --defense_checkpoint: a randomly "
            "initialized PU-Net upsampler does not defend (the reference "
            "DUP_Net.py:24 hard-loads its trained pu-in_1024-up_4.pth)"
        )
    if path.endswith((".pth", ".pt")):
        from pointcloudattack_tpu.train.torch_port import port_checkpoint

        return port_checkpoint("PUNet", path)
    import jax

    from pointcloudattack_tpu.defense import DUPNet
    from pointcloudattack_tpu.train.checkpoint import restore_checkpoint

    dup = DUPNet(npoint=npoint, up_ratio=4)
    return restore_checkpoint(
        path, like=dup.init(jax.random.PRNGKey(0))
    )


def _normalize_output(fn, model_name: str):
    """Raw-logit models (CurveNet) -> log-probs, so CE-based attack
    losses stay correct (margin losses are shift-invariant)."""
    from pointcloudattack_tpu import models as _models

    if _models.OUTPUT_KIND.get(model_name) != "logits":
        return fn
    import jax.nn as _jnn

    return lambda x: _jnn.log_softmax(fn(x), axis=-1)


def _surrogate_model_fn(args, cfg, num_classes):
    """White-box surrogate for the SIadv families, or None.

    The reference attacks a TARGET model with gradients from a separate
    SURROGATE (Eval_SIadv.py:180-182, surrogate PointNet -> target
    DGCNN); ``--surrogate_model/--surrogate_checkpoint`` reproduce that
    split. Returns None when no surrogate is requested (white-box self).
    """
    if not getattr(args, "surrogate_model", ""):
        return None
    if not args.surrogate_checkpoint:
        raise SystemExit(
            "--surrogate_model requires --surrogate_checkpoint "
            "(a randomly initialized surrogate gives useless gradients)"
        )
    def build():
        from pointcloudattack_tpu.utils.apply import make_model_fn

        s_cfg = dataclasses_replace_model(cfg, args.surrogate_model)
        s_model, s_vars = _build_model(s_cfg, num_classes)
        s_vars = _restore(
            s_cfg, args.surrogate_model, args.surrogate_checkpoint, s_vars
        )
        return _normalize_output(
            make_model_fn(s_model, s_vars), args.surrogate_model
        )

    # chunked sweeps call this once per chunk; rebuilding would re-port
    # the checkpoint and re-jit the surrogate forward every chunk
    return _memo_get(
        (
            "surrogate", args.surrogate_model, args.surrogate_checkpoint,
            num_classes, cfg.num_points, cfg.seed,
        ),
        build,
    )


def cmd_train(args):
    import jax

    from pointcloudattack_tpu import data as D
    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.train.checkpoint import save_checkpoint
    from pointcloudattack_tpu.train.trainer import TrainConfig, fit

    cfg = run_config_from_args(args)
    ds, num_classes = _load_dataset(cfg, "train")
    items = [ds[i] for i in range(len(ds))]
    clouds = np.stack([it[0] for it in items])
    labels = np.asarray([it[1] for it in items], dtype=np.int64)

    model, variables = _build_model(cfg, num_classes)
    tcfg = TrainConfig(
        learning_rate=args.lr,
        epochs=args.epochs,
        batch_size=cfg.batch_size,
        label_smoothing=0.2 if cfg.model == "CurveNet" else 0.0,
        output_kind=models.OUTPUT_KIND[cfg.model],
        feature_transform_reg=0.001 if cfg.feature_transform else 0.0,
    )
    # held-out eval split when one exists; synthetic (and face CSVs
    # without --eval_dataset_path) fall back to train-set accuracy
    eval_clouds, eval_labels = clouds, labels
    if args.eval_dataset_path:
        import dataclasses as _dc

        eval_ds, _ = _load_dataset(
            _dc.replace(cfg, dataset_path=args.eval_dataset_path), "test"
        )
        eval_items = [eval_ds[i] for i in range(len(eval_ds))]
        eval_clouds = np.stack([it[0] for it in eval_items])
        eval_labels = np.asarray(
            [it[1] for it in eval_items], dtype=np.int64
        )
    elif cfg.dataset in ("ModelNet", "ShapeNet"):
        eval_ds, _ = _load_dataset(cfg, "test")
        eval_items = [eval_ds[i] for i in range(len(eval_ds))]
        eval_clouds = np.stack([it[0] for it in eval_items])
        eval_labels = np.asarray(
            [it[1] for it in eval_items], dtype=np.int64
        )
    else:
        print(
            "note: no eval split available — reported eval_acc is "
            "train-set accuracy"
        )
    # data-parallel over all devices whenever the batch divides the
    # mesh (SURVEY §2.6 training-side DP) — transparent otherwise
    mesh = None
    bs = min(tcfg.batch_size, len(labels))
    if jax.device_count() > 1 and bs % jax.device_count() == 0:
        from pointcloudattack_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"training data-parallel over {mesh.devices.size} devices")
    variables = fit(
        model, variables, tcfg, clouds, labels,
        eval_data=eval_clouds, eval_labels=eval_labels, seed=cfg.seed,
        log_fn=print, mesh=mesh,
    )
    out = os.path.join(
        cfg.output_dir,
        f"{cfg.model}_model_on_{cfg.dataset}",
    )
    save_checkpoint(out, variables)
    print(f"saved checkpoint to {out}")


def cmd_test(args):
    from pointcloudattack_tpu.parallel.driver import sharded_accuracy
    from pointcloudattack_tpu.utils.apply import make_model_fn

    cfg = run_config_from_args(args)
    ds, num_classes = _load_dataset(cfg, "test")
    items = [ds[i] for i in range(len(ds))]
    clouds = np.stack([it[0] for it in items])
    labels = np.asarray([it[1] for it in items], dtype=np.int64)

    model, variables = _build_model(cfg, num_classes)
    variables = _restore(cfg, cfg.model, cfg.checkpoint, variables)
    acc = sharded_accuracy(make_model_fn(model, variables), clouds, labels)
    print(f"accuracy: {acc:.4f} ({len(labels)} examples)")
    return acc


def _dump_adv(outdir, name, adv, labels, preds):
    """Per-cloud txt dumps like the reference AdvData folders."""
    os.makedirs(outdir, exist_ok=True)
    for i in range(len(adv)):
        path = os.path.join(
            outdir, f"{name}_{i}_label{int(labels[i])}_pred{int(preds[i])}.txt"
        )
        np.savetxt(path, np.asarray(adv[i]), fmt="%.6f")


ATTACK_FAMILIES = (
    "cw", "cw-robust", "perturb", "knn", "geoa3", "geoa3-partial",
    "aof", "taof", "cta", "iso",
    "siadv", "simba", "simbapp", "si-query", "add-points", "add-clusters",
)


# Chunked sweeps (--attack_batch) call _run_family once per chunk.
# Memoizing the attack builders on (builder, model_fn, frozen config)
# returns the SAME jitted callable every chunk, so jax's jit cache turns
# the per-chunk re-trace + re-lower into a dict hit (the compiled
# executable itself was already shared via the persistent cache).
# FIFO-capped: entries pin jitted closures + model variables.
_BUILD_MEMO: dict = {}


def _memo_get(key, thunk):
    """FIFO-capped memo lookup; unhashable keys build uncached."""
    try:
        hash(key)
    except TypeError:  # unhashable key component — build uncached
        return thunk()
    if key not in _BUILD_MEMO:
        if len(_BUILD_MEMO) >= 32:
            _BUILD_MEMO.pop(next(iter(_BUILD_MEMO)))
        _BUILD_MEMO[key] = thunk()
    return _BUILD_MEMO[key]


def _memo_build(build_fn, *key_args):
    return _memo_get(
        (build_fn, *key_args), lambda: build_fn(*key_args)
    )


def _attack_with_fused_fallback(run):
    """Run an attack dispatch with Mosaic-rejection insurance: on a
    Mosaic/Pallas failure, disable the fused chain+pool kernels, clear
    the builder memo (its closures hold programs with the kernels baked
    in), and retry once on the XLA path — see
    models/common.py::retry_without_fused_maxpool (shared with bench.py
    and __graft_entry__).  All chunks of a sweep share one executable,
    so a rejection fires on the first chunk and the retry re-runs
    essentially nothing."""
    from pointcloudattack_tpu.models.common import (
        retry_without_fused_maxpool,
    )

    return retry_without_fused_maxpool(run, on_disable=_BUILD_MEMO.clear)


def _run_family(
    args, cfg, family, model_fn, data, target, labels, true_labels,
    targeted, key, num_classes, clouds,
):
    """Dispatch one attack family; returns (adv, success).

    --binary_step / --num_iter of 0 mean "use the family's reference
    default" (each config dataclass carries it).
    """
    import jax
    import jax.numpy as jnp

    if family in ("cw", "perturb"):
        from pointcloudattack_tpu.attacks.cw import (
            CWPerturbConfig,
            build_cw_attack,
        )

        acfg = CWPerturbConfig(
            attack_lr=args.attack_lr,
            binary_step=args.binary_step or 10,
            num_iter=args.num_iter or 500,
            kappa=args.kappa, budget=args.budget,
            targeted=targeted, adv_func=args.adv_func,
        )
        res = _memo_build(build_cw_attack, model_fn, acfg)(data, target, key)
        adv, success = res.best_attack, res.success
    elif family == "cw-robust":
        # additional_exp twin (reference attack/additional_exp/CW_attack.py)
        from pointcloudattack_tpu.attacks.cw_robust import (
            RobustCWConfig,
            build_robust_cw_attack,
        )
        from pointcloudattack_tpu.losses.distance import l2_dist

        acfg = RobustCWConfig(
            attack_lr=args.attack_lr,
            binary_step=args.binary_step or 10,
            num_iter=args.num_iter or 500,
            kappa=args.kappa, targeted=targeted,
            whether_1d=bool(args.whether_1d),
            box_constraint=args.box_constraint,
            renormalization=bool(args.renormalization),
            transform_eot=bool(args.eot),
            resample=bool(args.resample),
        )
        adv, _, success = _memo_build(
            build_robust_cw_attack, model_fn, l2_dist, acfg
        )(data, target, key)
    elif family == "geoa3-partial":
        from pointcloudattack_tpu.attacks.geoa3_partial import (
            GeoA3PartialConfig,
            build_geoa3_partial_attack,
        )

        acfg = GeoA3PartialConfig(
            lr=args.attack_lr, binary_max_steps=args.binary_step or 10,
            iter_max_steps=args.num_iter or 500, targeted=targeted,
            cls_loss_type=args.cls_loss_type,
            confidence=args.confidence,
            curv_knn_refresh=args.curv_knn_refresh,
            knn_range=args.knn_range, refresh_iters=args.refresh_iters,
            subsample_npoint=args.subsample_npoint,
        )
        adv, _, success = _memo_build(
            build_geoa3_partial_attack, model_fn, acfg
        )(data, target, key)
    elif family == "knn":
        from pointcloudattack_tpu.attacks.knn import (
            KNNAttackConfig,
            build_knn_attack,
        )

        acfg = KNNAttackConfig(
            attack_lr=args.attack_lr, num_iter=args.num_iter or 2500,
            kappa=args.kappa, budget=args.budget, targeted=targeted,
            adv_func=args.adv_func, nn_refresh=args.nn_refresh,
        )
        adv, success = _memo_build(build_knn_attack, model_fn, acfg)(data, target, key)
    elif family == "geoa3":
        from pointcloudattack_tpu.attacks.geoa3 import (
            GeoA3Config,
            build_geoa3_attack,
        )

        acfg = GeoA3Config(
            lr=args.attack_lr, binary_max_steps=args.binary_step or 10,
            iter_max_steps=args.num_iter or 500, targeted=targeted,
            # the reference Eval_GeoA3 loss knobs (Eval_GeoA3.py:154-191;
            # its knn_smoothing/laplacian/edge flags are declared but
            # never used by GeoA3_attack._forward_step)
            cls_loss_type=args.cls_loss_type,
            confidence=args.confidence,
            dis_loss_type=args.dis_loss_type,
            dis_loss_weight=args.dis_loss_weight,
            is_cd_single_side=bool(args.is_cd_single_side),
            hd_loss_weight=args.hd_loss_weight,
            curv_loss_weight=args.curv_loss_weight,
            curv_loss_knn=args.curv_loss_knn,
            curv_knn_refresh=args.curv_knn_refresh,
            initial_const=args.initial_const,
            use_lr_scheduler=bool(args.use_lr_scheduler),
            use_jitter=bool(args.use_jitter),
            use_offset_proj=bool(args.use_offset_proj),
            cc_linf=args.cc_linf,
        )
        adv, _, success = _memo_build(build_geoa3_attack, model_fn, acfg)(
            data, target, key
        )
    elif family in ("aof", "taof"):
        from pointcloudattack_tpu.attacks.aof import (
            AOFConfig,
            build_aof_attack,
        )

        acfg = AOFConfig(
            attack_lr=args.attack_lr, binary_step=args.binary_step or 2,
            num_iter=args.num_iter or 200, budget=args.budget,
            kappa=args.kappa,
            targeted=(family == "taof"), low_pass=args.low_pass,
            gamma=args.aof_gamma,
        )
        # the targeted TAOF success rule needs the TRUE labels for its
        # lfc_pred != y_truth clause (reference TAOF_attack.py:205-211)
        adv, best_dist, success = _memo_build(build_aof_attack, model_fn, acfg)(
            data, target, key,
            jnp.asarray(true_labels) if family == "taof" else None,
        )
        # (the Eval_AOF.py:245-259 npz bundle is written by cmd_attack
        # after pad-slicing)
    elif family == "siadv":
        from pointcloudattack_tpu.attacks.siadv import (
            SIAdvConfig,
            build_si_ifgm,
        )

        acfg = SIAdvConfig(
            eps=args.budget, step_size=args.step_size,
            max_steps=args.num_iter or 50,
            top5_attack=bool(args.top5_attack),
        )
        wb_fn = _surrogate_model_fn(args, cfg, num_classes) or model_fn
        adv, pred, success = _memo_build(build_si_ifgm, wb_fn, model_fn, acfg)(
            data, target
        )
    elif family in ("simba", "simbapp", "si-query"):
        from pointcloudattack_tpu.attacks import siadv as S

        kw = {"max_queries": args.num_iter} if args.num_iter else {}
        acfg = S.SIAdvConfig(
            eps=args.budget, step_size=args.step_size,
            top5_attack=bool(args.top5_attack), **kw
        )
        if family == "simba":
            if getattr(args, "surrogate_model", ""):
                raise SystemExit(
                    "simba is pure black-box — it takes no surrogate "
                    "(use simbapp or si-query for surrogate gradients)"
                )
            adv, pred, success, queries = _memo_build(
                S.build_simba, model_fn, acfg
            )(data, target, key)
        elif family == "simbapp":
            wb_fn = _surrogate_model_fn(args, cfg, num_classes) or model_fn
            adv, pred, success, queries = _memo_build(
                S.build_simbapp, wb_fn, model_fn, acfg
            )(data, target, key)
        else:
            wb_fn = _surrogate_model_fn(args, cfg, num_classes) or model_fn
            adv, pred, success, queries = _memo_build(
                S.build_si_query_attack, wb_fn, model_fn, acfg
            )(data, target)
        # slice mesh padding off before averaging — cmd_attack pads the
        # batch with edge-replicated rows when sharding, and those
        # duplicates would skew the reported query cost
        print(
            "mean query cost: "
            f"{np.asarray(queries)[: len(clouds)].mean():.1f}"
        )
    elif family == "cta":
        from pointcloudattack_tpu.attacks.cta import (
            CTAConfig,
            build_cta_attack,
        )

        acfg = CTAConfig(
            target_mode=args.cta_target_mode,
            # CTA_sumloss twin (reference CTA_sumloss.py:171-178) /
            # CTA.py's penalize_dis chamfer variant (CTA.py:166-173)
            penalize_dis=args.cta_penalize_dis,
            beta=args.cta_beta,
        )
        adv, pred, success, steps = _memo_build(build_cta_attack, model_fn, acfg)(
            data, target, key
        )
    elif family == "iso":
        from pointcloudattack_tpu.attacks import iso as I

        bandit = I.BernThompson(
            d=4, a0=-np.pi, b0=np.pi, seed=cfg.seed
        )
        grad_attack = I.build_gradient_iso_attack(
            model_fn,
            I.ISOConfig(step_size=args.iso_step_size,
                        num_steps=args.num_iter or 50,
                        lam=args.iso_lambda),
            batched=True,
        )
        tsi_probe = I.build_tsi_probe(model_fn)

        # pre/post probes are batched into ONE forward each — on the
        # axon tunnel every host fetch costs ~25 ms, and only the bandit
        # itself is sequential (VERDICT r2 weak #5)
        tgt_np = np.asarray(target)
        probs0 = np.asarray(jax.nn.softmax(model_fn(data), axis=-1))
        prob_before_all = probs0[np.arange(len(labels)), tgt_np]

        if args.iso_lockstep:
            # batched-Thompson TSI: one probe per round for the whole
            # batch instead of one per round per sample (documented
            # posterior-order deviation, attacks/iso.py::
            # thompson_sample_attack_lockstep)
            ws_all, ok_all, _tries = I.thompson_sample_attack_lockstep(
                bandit, data, target, num_init=args.num_init,
                model_fn=model_fn, key=jax.random.fold_in(key, 9001),
            )
            tsi_results = [
                (ws_all[i], bool(ok_all[i])) for i in range(len(labels))
            ]
        else:
            tsi_results = []
            for i in range(len(labels)):
                w, ok, _tries = I.thompson_sample_attack(
                    None, bandit, data[i : i + 1], target[i : i + 1],
                    num_init=args.num_init, probe=tsi_probe,
                )
                tsi_results.append((w, bool(ok)))

        init_succ_list = [int(ok) for _, ok in tsi_results]
        ok_arr = np.asarray([ok for _, ok in tsi_results], dtype=bool)
        ws_final = np.stack(
            [np.asarray(w, dtype=np.float32) for w, _ in tsi_results]
        )  # [B, 3, 3]
        pens = [0.0] * len(labels)
        steps_list = [0] * len(labels)
        succ_list = [bool(o) for o in ok_arr]
        if not ok_arr.all():
            # every CTRI fallback in ONE executable: the vmapped
            # per-sample loop (per-lane trajectories/keys match the old
            # solo B=1 calls up to batched-matmul rounding —
            # build_gradient_iso_attack docstring); lanes whose TSI
            # already succeeded early-exit after one step and their
            # results are discarded below
            keys = jnp.stack(
                [jax.random.fold_in(key, i) for i in range(len(labels))]
            )
            bw, bok, bpen, bsteps = grad_attack(
                data[:, None], target[:, None],
                jnp.asarray(ws_final), keys,
            )
            bw = np.asarray(bw)
            bok = np.asarray(bok)[:, 0]
            bpen, bsteps = np.asarray(bpen), np.asarray(bsteps)
            for i in np.nonzero(~ok_arr)[0]:
                ws_final[i] = bw[i]
                succ_list[i] = bool(bok[i])
                pens[i] = float(bpen[i])
                steps_list[i] = int(bsteps[i])

        adv = np.asarray(
            jnp.einsum("bnc,bdc->bnd", data, jnp.asarray(ws_final))
        )
        logits_after = np.asarray(model_fn(jnp.asarray(adv)))
        probs_after = np.asarray(
            jax.nn.softmax(jnp.asarray(logits_after), axis=-1)
        )
        prob_after_all = probs_after[np.arange(len(labels)), tgt_np]
        pred_after_all = np.argmax(logits_after, axis=-1)

        rows = []
        for i in range(len(labels)):
            # reference per-sample schema:
            # attack/ISO/logs_attack/ctri_modelnet40_PointNet_attack.csv
            rows.append(
                [i, int(true_labels[i]),
                 round(float(prob_before_all[i]), 5),
                 round(float(prob_after_all[i]), 5),
                 int(pred_after_all[i]), pens[i], steps_list[i],
                 round(float(np.mean(succ_list[: i + 1])), 4),
                 round(float(np.mean(init_succ_list[: i + 1])), 4)]
            )
        os.makedirs(cfg.output_dir, exist_ok=True)
        import csv as _csv

        with open(
            os.path.join(cfg.output_dir, "iso_attack_log.csv"), "w",
            newline="",
        ) as f:
            w = _csv.writer(f)
            w.writerow(
                ["index", "true_label", "prob_before", "prob_after",
                 "pred_label", "penalty", "steps",
                 "running_success_rate", "tsi_init_success_rate"]
            )
            w.writerows(rows)
        success = np.asarray(succ_list)
    elif family == "add-points":
        from pointcloudattack_tpu.attacks.gen3dadv import (
            AddPointsConfig,
            build_add_points_attack,
        )

        kw = {}
        if args.init_weight:
            kw["init_weight"] = args.init_weight
        if args.max_weight:
            kw["max_weight"] = args.max_weight
        acfg = AddPointsConfig(
            attack_lr=args.attack_lr, binary_step=args.binary_step or 10,
            num_iter=args.num_iter or 500, num_add=args.num_add,
            targeted=targeted, kappa=args.kappa, **kw,
        )
        adv, added, dist, success = _memo_build(
            build_add_points_attack, model_fn, acfg
        )(data, target, key)
    elif family == "add-clusters":
        from pointcloudattack_tpu.attacks.gen3dadv import (
            AddClustersConfig,
            build_add_clusters_attack,
        )

        kw = {}
        if args.init_weight:
            kw["init_weight"] = args.init_weight
        if args.max_weight:
            kw["max_weight"] = args.max_weight
        acfg = AddClustersConfig(
            attack_lr=args.attack_lr, binary_step=args.binary_step or 5,
            num_iter=args.num_iter or 500, targeted=targeted,
            kappa=args.kappa, num_add=args.cl_num_add,
            cl_num_p=args.cl_num_p, **kw,
        )
        adv, added, dist, success = _memo_build(
            build_add_clusters_attack, model_fn, acfg
        )(data, target, key)
    else:
        raise SystemExit(f"unknown attack family {family!r}")
    return adv, success


# args that cannot change a chunk's (adv, success) payload: artifact
# locations, observability switches, and the post-hoc transfer panel
# (evaluated AFTER the sweep on whatever adv came out of it)
_FINGERPRINT_EXCLUDE = frozenset({
    "func", "command", "output_dir", "resume", "save_adv",
    "profile_dir", "debug_nans", "transfer_test", "trans_model",
    "trans_checkpoint",
})


def _chunk_fingerprint(args, cfg, family, n) -> str:
    """Config fingerprint stored in every chunk file: --resume refuses
    to splice results produced under different attack settings.

    Hashes EVERY parsed attack argument except the explicit
    result-irrelevant exclude list above — an omitted-by-accident flag
    (the round-3 advisor found --adv_func/--nn_refresh/... missing from
    a hand-picked include list) would silently splice chunks computed
    under different configurations."""
    keyfields = {
        k: v
        for k, v in sorted(vars(args).items())
        if k not in _FINGERPRINT_EXCLUDE and not callable(v)
    }
    keyfields["family"] = family
    keyfields["n"] = n
    return json.dumps(keyfields, sort_keys=True, default=str)


def _run_family_chunked(
    args, cfg, family, model_fn, data, target, labels, true_labels,
    targeted, key, num_classes, clouds,
):
    """Fixed-shape chunked attack sweep: streaming artifacts + resume.

    Production-scale sweeps can't run as one monolithic device batch
    (the unfused backward of a [B, N, 1024] victim map exhausts HBM long
    before the reference's ~6k-cloud datasets are covered, and a crash
    at sample 5,000 loses everything).  ``--attack_batch B`` instead:

      * splits the sample set into B-sized chunks, edge-padding the last
        one so EVERY chunk presents the same [B, N, 3] shape — one
        compiled executable serves the whole sweep (on the axon tunnel
        each distinct executable costs a 60-130 s first-execution server
        load; fixed shapes pay it once);
      * shards each chunk over the device mesh when >1 device is up
        (same pad/shard contract as the unchunked path);
      * writes each chunk's (adv, success) to
        ``<output_dir>/attack_chunks/<family>_<i>.npz`` as it completes,
        with a config fingerprint;
      * with ``--resume`` skips chunks whose file already exists and
        matches the fingerprint — a killed sweep restarts where it died.

    Per-chunk RNG is ``fold_in(key, 1000 + chunk)``: chunking changes
    random draws vs the single-batch path (statistical, not bitwise,
    parity — the same contract as mesh padding, documented above).
    """
    import jax
    import jax.numpy as jnp

    from pointcloudattack_tpu.parallel.mesh import make_mesh, shard_batch

    data_np = np.asarray(data)
    tgt_np = np.asarray(target)
    lab_np = np.asarray(labels)
    tl_np = np.asarray(true_labels)
    clouds_np = np.asarray(clouds)
    n = len(lab_np)
    bs = min(args.attack_batch, n)
    mesh = None
    if jax.device_count() > 1 and bs >= jax.device_count():
        mesh = make_mesh()
        bs -= bs % mesh.devices.size  # keep chunks mesh-divisible
        print(
            f"sharding each {bs}-chunk over {mesh.devices.size} devices"
        )
    nchunks = (n + bs - 1) // bs
    chunk_dir = os.path.join(cfg.output_dir, "attack_chunks")
    os.makedirs(chunk_dir, exist_ok=True)
    fingerprint = _chunk_fingerprint(args, cfg, family, n)

    adv_parts, succ_parts = [], []
    for ci in range(nchunks):
        path = os.path.join(chunk_dir, f"{family}_{ci:05d}.npz")
        lo = ci * bs
        hi = min(lo + bs, n)
        m = hi - lo
        if args.resume and os.path.exists(path):
            # a chunk file can be truncated if the sweep was killed
            # mid-np.savez (the exact scenario --resume exists for) —
            # treat an unreadable file as a missing chunk, not a crash
            try:
                z = np.load(path, allow_pickle=False)
                ok = (
                    "fingerprint" in z.files
                    and str(z["fingerprint"]) == fingerprint
                    and z["adv"].shape[0] == m
                )
            except Exception as e:
                ok = False
                print(
                    f"chunk {ci + 1}/{nchunks}: unreadable chunk file "
                    f"({type(e).__name__}) — re-running"
                )
            else:
                if ok:
                    adv_parts.append(z["adv"])
                    succ_parts.append(z["success"])
                    print(
                        f"chunk {ci + 1}/{nchunks}: resumed from {path}"
                    )
                    continue
                print(
                    f"chunk {ci + 1}/{nchunks}: stale chunk file "
                    f"(config changed) — re-running"
                )
        sel = np.arange(lo, hi)
        if m < bs:  # edge-replicate: keeps the compiled shape fixed
            sel = np.concatenate([sel, np.full(bs - m, hi - 1)])
        d = jnp.asarray(data_np[sel])
        t = jnp.asarray(tgt_np[sel])
        ck = jax.random.fold_in(key, 1000 + ci)
        if mesh is not None:
            d, t = shard_batch(mesh, d, t)
            with mesh:
                adv_c, succ_c = _run_family(
                    args, cfg, family, model_fn, d, t, lab_np[sel],
                    tl_np[sel], targeted, ck, num_classes,
                    clouds_np[sel[:m]],
                )
        else:
            adv_c, succ_c = _run_family(
                args, cfg, family, model_fn, d, t, lab_np[sel],
                tl_np[sel], targeted, ck, num_classes, clouds_np[sel[:m]],
            )
        adv_c = np.asarray(adv_c)[:m]
        succ_c = np.asarray(succ_c)[:m]
        # atomic publish: np.savez is not atomic, and a half-written
        # chunk must never be mistaken for a finished one on --resume
        tmp = path + ".tmp.npz"  # np.savez appends .npz to other names
        np.savez(tmp, adv=adv_c, success=succ_c, fingerprint=fingerprint)
        os.replace(tmp, path)
        adv_parts.append(adv_c)
        succ_parts.append(succ_c)
        print(
            f"chunk {ci + 1}/{nchunks}: ASR "
            f"{float(succ_c.mean()):.3f} -> {path}",
            flush=True,
        )
    return np.concatenate(adv_parts), np.concatenate(succ_parts)


def cmd_attack(args):
    import jax
    import jax.numpy as jnp

    from pointcloudattack_tpu.utils.apply import make_model_fn

    cfg = run_config_from_args(args)
    if args.face_txt:
        # face-probe targeted experiments: one txt cloud, repeated
        # (reference attack/KNN/Eval_KNN.py targeted branch,
        # attack/AOF/Eval_TAOF_face0424.py)
        from pointcloudattack_tpu.data.io import normalize_cloud, read_xyz

        pts = read_xyz(args.face_txt)[:, :3]
        rng = np.random.RandomState(cfg.seed)
        order = rng.permutation(len(pts))[: cfg.num_points]
        clouds = normalize_cloud(pts[order]).astype(np.float32)[None]
        labels = np.asarray([args.face_label], dtype=np.int64)
        num_classes = cfg.num_classes or 106
    else:
        ds, num_classes = _load_dataset(cfg, "test")
        n = min(len(ds), args.num_samples) if args.num_samples else len(ds)
        items = [ds[i] for i in range(n)]
        clouds = np.stack([it[0] for it in items]).astype(np.float32)
        labels = np.asarray([it[1] for it in items], dtype=np.int64)

    model, variables = _build_model(cfg, num_classes)
    variables = _restore(cfg, cfg.model, cfg.checkpoint, variables)
    compute_dtype = (
        jnp.bfloat16 if args.compute_dtype == "bf16" else None
    )
    model_fn = _normalize_output(
        make_model_fn(model, variables, compute_dtype=compute_dtype),
        cfg.model,
    )
    if args.defense != "none":
        from pointcloudattack_tpu.attacks.evaluation import with_defense

        dup_variables = (
            _load_dup_variables(args.defense_checkpoint, cfg.num_points)
            if args.defense == "dupnet"
            else None
        )
        model_fn = with_defense(
            model_fn, args.defense, key=jax.random.PRNGKey(cfg.seed + 7),
            npoint=cfg.num_points, dup_variables=dup_variables,
        )
        # one executable for defense head + forward: the defense ops
        # (SOR kNN etc.) would otherwise dispatch eagerly per direct
        # eval call (~25 ms/op on the axon tunnel); inside attack jits
        # this wrapper just inlines
        model_fn = jax.jit(model_fn)

    targeted = args.attack_method == "target"
    key = jax.random.PRNGKey(cfg.seed)
    family = args.family

    if args.all_targets and not args.face_txt:
        # the sweep is defined for face-probe impersonation only
        # (reference attack/KNN/Eval_KNN.py loops targets over ONE face
        # probe); silently ignoring the flag would fake a full sweep
        raise SystemExit("--all_targets requires --face_txt/--face_label")
    if args.face_txt and args.all_targets:
        # one-command all-targets impersonation sweep: every class id
        # becomes the target of one batch row (the reference's targeted
        # Eval_KNN loop over j, attack/KNN/Eval_KNN.py:70-101 — shipped
        # truncated to range(0,1); this runs the full sweep BATCHED)
        if not targeted:
            raise SystemExit("--all_targets requires --attack_method target")
        clouds = np.repeat(clouds, num_classes, axis=0)
        labels = np.arange(num_classes, dtype=np.int64)
        true_labels = np.full(
            num_classes, args.face_label, dtype=np.int64
        )
        data = jnp.asarray(clouds)
        target = jnp.asarray(labels)
    else:
        data = jnp.asarray(clouds)
        true_labels = labels  # kept for dumps/npz/recovery stats
    if targeted and not args.face_txt:
        # dataset-mode targeted runs need a target different from the
        # truth; --target_class sets it globally, default rotates to
        # the next class
        if args.target_class >= 0:
            tgt_np = np.full_like(labels, args.target_class)
        else:
            tgt_np = (labels + 1) % num_classes
        target = jnp.asarray(tgt_np)
        labels = tgt_np
    else:
        target = jnp.asarray(labels)
    if args.attack_method == "top1_error":
        # attack toward the clean prediction's runner-up class
        # (reference attack/CW/CW_attack.py:86-89)
        clean_logits = np.asarray(model_fn(data))
        order2 = np.argsort(-clean_logits, axis=-1)[:, 1]
        target = jnp.asarray(order2.astype(np.int64))
        labels = np.asarray(order2, dtype=np.int64)
        targeted = True

    # SURVEY §2.6(a): batch-sharded attack generation is the production
    # default — when the runtime exposes >1 device and the batch can
    # fill the mesh, pad/shard the batch and let XLA partition the
    # jitted attack (attack math is per-example; only batch-sized RNG
    # draws differ when padding changes B).  The ISO family is a
    # per-sample host bandit loop and stays single-device.  This builds
    # on the same pad_to_multiple/shard_batch primitives as
    # parallel/driver.run_sharded_attack; it doesn't call that wrapper
    # because the CLI also carries labels/true_labels through the
    # pad-and-slice contract and dispatches per family inside the mesh.
    true_n = len(labels)
    use_chunks = args.attack_batch > 0 and family != "iso"
    if args.attack_batch > 0 and family == "iso":
        # the ISO runner is already a per-sample host loop with its own
        # whole-set CSV log; chunking would only fragment the log
        raise SystemExit("--attack_batch does not apply to the iso family")
    mesh = None
    if (
        not use_chunks
        and jax.device_count() > 1
        and family != "iso"
        and true_n >= jax.device_count()
    ):
        from pointcloudattack_tpu.parallel.mesh import (
            make_mesh,
            pad_to_multiple,
            shard_batch,
        )

        mesh = make_mesh()
        (d_p, t_p, lab_p, tl_p), _ = pad_to_multiple(
            [np.asarray(data), np.asarray(target),
             np.asarray(labels), np.asarray(true_labels)],
            mesh.devices.size,
        )
        data, target = shard_batch(
            mesh, jnp.asarray(d_p), jnp.asarray(t_p)
        )
        labels, true_labels = lab_p, tl_p
        print(f"sharding batch over {mesh.devices.size} devices")

    from pointcloudattack_tpu.utils.profiling import profile_trace

    profile_ctx = profile_trace(getattr(args, "profile_dir", ""))
    profile_ctx.__enter__()
    t0 = time.time()
    try:
        if use_chunks:
            adv, success = _attack_with_fused_fallback(
                lambda: _run_family_chunked(
                    args, cfg, family, model_fn, data, target, labels,
                    true_labels, targeted, key, num_classes, clouds,
                )
            )
        elif mesh is not None:
            def _sharded_run():
                with mesh:
                    return _run_family(
                        args, cfg, family, model_fn, data, target,
                        labels, true_labels, targeted, key, num_classes,
                        clouds,
                    )

            adv, success = _attack_with_fused_fallback(_sharded_run)
        else:
            adv, success = _attack_with_fused_fallback(
                lambda: _run_family(
                    args, cfg, family, model_fn, data, target, labels,
                    true_labels, targeted, key, num_classes, clouds,
                )
            )
    finally:
        dt = time.time() - t0
        profile_ctx.__exit__(None, None, None)

    # slice padding back off before any metric/artifact consumes results
    adv = np.asarray(adv)[:true_n]
    labels = np.asarray(labels)[:true_n]
    true_labels = np.asarray(true_labels)[:true_n]
    success = np.asarray(success)[:true_n]

    if family in ("aof", "taof"):
        # npz result bundle like reference Eval_AOF.py:245-259 (written
        # here, after pad-slicing, not inside _run_family)
        os.makedirs(cfg.output_dir, exist_ok=True)
        np.savez(
            os.path.join(cfg.output_dir, f"{family}_results.npz"),
            test_pc=adv,
            test_label=true_labels,
            target_label=labels,
        )
    asr = float(success.mean())
    print(
        f"attack {family}: ASR {asr:.3f} "
        f"({int(success.sum())}/{len(success)}) in {dt:.1f}s"
    )

    adv_np = np.asarray(adv)
    summary = {
        "family": family, "model": cfg.model, "asr": asr,
        "wall_clock_s": dt, "n": int(len(success)),
    }
    if args.face_txt and args.all_targets:
        summary["per_target_success"] = {
            int(t): bool(s) for t, s in zip(labels, success)
        }

    # imperceptibility metrics (reference Eval_SIadv.py:140-157)
    if adv_np.shape[1] == clouds.shape[1]:
        from pointcloudattack_tpu.utils.metrics import (
            imperceptibility_metrics,
        )

        im = imperceptibility_metrics(adv_np, clouds)
        summary.update(im)
        print(
            f"MSE {im['mse']:.6f}  Chamfer {im['chamfer']:.6f}  "
            f"Hausdorff {im['hausdorff']:.6f}"
        )

    if args.save_adv:
        preds = np.argmax(np.asarray(model_fn(jnp.asarray(adv_np))), axis=-1)
        _dump_adv(
            os.path.join(cfg.output_dir, "AdvData", cfg.model),
            family, adv_np, true_labels, preds,
        )

    # shuffle + transfer self-tests (reference CW_attack.py:226-257)
    if adv_np.shape[1] == clouds.shape[1]:
        from pointcloudattack_tpu.attacks.evaluation import (
            shuffle_robustness,
            transfer_matrix,
        )

        adv_j = jnp.asarray(adv_np)
        shuf = shuffle_robustness(
            model_fn, adv_j, jnp.asarray(labels),
            jax.random.PRNGKey(cfg.seed + 1), targeted=targeted,
        )
        summary["shuffle_asr"] = shuf
        print(f"shuffle-robust ASR: {shuf:.3f}")
        if args.transfer_test and cfg.trans_model:
            # --trans_model/--trans_checkpoint accept comma-separated
            # panels — the reference KNN/GeoA3 attacks self-test against
            # up to 5 models (KNN_attack.py:175-240, GeoA3:407-471).
            # Pairing is positional BEFORE dropping empty slots, and
            # duplicate model names get #i suffixes so two checkpoints
            # of the same architecture both appear in the matrix.
            names = cfg.trans_model.split(",")
            ckpts = (cfg.trans_checkpoint or "").split(",")
            if len(ckpts) > len(names) and any(c for c in ckpts[len(names):]):
                raise SystemExit(
                    f"--trans_checkpoint lists {len(ckpts)} entries for "
                    f"{len(names)} --trans_model entries; pairing is "
                    "positional, the extras would be silently dropped"
                )
            ckpts += [""] * (len(names) - len(ckpts))
            panel = {}
            for t_name, t_ckpt in zip(names, ckpts):
                if not t_name:
                    continue
                if not t_ckpt:
                    # a random-init panel member scores meaningless
                    # transfer ASR — loud, not silent
                    print(
                        f"WARNING: transfer panel member {t_name!r} has "
                        "no --trans_checkpoint slot; scoring against "
                        "RANDOMLY INITIALIZED weights",
                        file=sys.stderr,
                    )
                t_model, t_vars = _build_model(
                    dataclasses_replace_model(cfg, t_name), num_classes
                )
                t_vars = _restore(cfg, t_name, t_ckpt, t_vars)
                key_name = t_name
                i = 2
                while key_name in panel:
                    key_name = f"{t_name}#{i}"
                    i += 1
                panel[key_name] = _normalize_output(
                    make_model_fn(t_model, t_vars), t_name
                )
            # spread the heterogeneous panel over the mesh: member k on
            # device k%n, evaluated concurrently (evaluation.py
            # transfer_matrix devices=)
            devs = jax.devices()
            mat = transfer_matrix(
                panel, adv_j, jnp.asarray(labels), targeted=targeted,
                devices=devs if len(devs) > 1 else None,
            )
            summary["transfer_asr"] = mat
            print(f"transfer ASR: {mat}")
    from pointcloudattack_tpu.utils.metrics import write_json

    write_json(
        os.path.join(cfg.output_dir, f"attack_{family}_summary.json"),
        summary,
    )
    return asr




def dataclasses_replace_model(cfg: RunConfig, model: str) -> RunConfig:
    import dataclasses as _dc

    return _dc.replace(cfg, model=model)


def cmd_test_advdata(args):
    """Re-classify saved adversarial txt clouds (reference Test_AdvData.py)."""
    import jax.numpy as jnp

    from pointcloudattack_tpu.utils.apply import make_model_fn

    cfg = run_config_from_args(args)
    model, variables = _build_model(cfg, cfg.num_classes or 10)
    variables = _restore(cfg, cfg.model, cfg.checkpoint, variables)
    model_fn = make_model_fn(model, variables)

    files = sorted(
        os.path.join(args.adv_dir, f)
        for f in os.listdir(args.adv_dir)
        if f.endswith(".txt")
    )
    correct = 0
    for path in files:
        pts = np.loadtxt(path).astype(np.float32)[None]
        pred = int(
            np.argmax(np.asarray(model_fn(jnp.asarray(pts))), axis=-1)[0]
        )
        label = None
        for tok in os.path.basename(path).split("_"):
            if tok.startswith("label"):
                label = int(tok.removeprefix("label"))
        state = "?" if label is None else ("OK" if pred == label else "ADV")
        if label is not None and pred == label:
            correct += 1
        print(f"{os.path.basename(path)}: pred={pred} [{state}]")
    print(f"{correct}/{len(files)} recovered to true label")


def cmd_view(args):
    """Interactive viewer on a saved cloud (reference show3d_balls.py)."""
    from pointcloudattack_tpu.viz.viewer import showpoints

    pts = np.loadtxt(args.cloud).astype(np.float32)[:, :3]
    cmds = list(args.cmds) if args.cmds else None
    showpoints(
        pts, cmds=cmds, out_path=args.out or "show3d.ppm",
        size=args.size,
    )


def cmd_make_splits(args):
    from pointcloudattack_tpu.data.csvsplit import generate_split_csvs

    train, ev, test, dirty = generate_split_csvs(
        args.data_root, ext=args.ext, seed=args.seed
    )
    print(
        f"train {len(train)}  eval {len(ev)}  test {len(test)}  "
        f"dirty {len(dirty)}"
    )


def build_parser():
    parser = argparse.ArgumentParser(prog="pointcloudattack_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = add_common_args(sub.add_parser("train"))
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--eval_dataset_path", default="",
                   help="held-out split csv/root for eval accuracy")
    p.set_defaults(fn=cmd_train)

    p = add_common_args(sub.add_parser("test"))
    p.set_defaults(fn=cmd_test)

    p = add_common_args(sub.add_parser("attack"))
    p.add_argument("family", choices=list(ATTACK_FAMILIES),
                   help="attack family")
    p.add_argument("--attack_method", default="untarget",
                   help="untarget | target | top1_error")
    p.add_argument("--adv_func", default="logits",
                   help="logits | cross_entropy")
    p.add_argument("--kappa", type=float, default=30.0)
    p.add_argument("--attack_lr", type=float, default=1e-2)
    p.add_argument("--binary_step", type=int, default=0,
                   help="0 = family reference default")
    p.add_argument("--num_iter", type=int, default=0,
                   help="0 = family reference default")
    p.add_argument("--budget", type=float, default=0.18)
    p.add_argument("--step_size", type=float, default=0.07,
                   help="SIadv/SimBA step size (reference default 0.07)")
    p.add_argument("--iso_step_size", type=float, default=5e-4,
                   help="ISO CTRI Adam lr (reference iso_attack.py "
                        "default 5e-4 — separate from --step_size)")
    p.add_argument("--low_pass", type=int, default=100)
    p.add_argument("--aof_gamma", type=float, default=0.5,
                   help="AOF full/lfc adv-loss blend "
                        "(reference TAOF_attack.py:60 GAMMA)")
    p.add_argument("--num_add", type=int, default=512,
                   help="add-points: points added (IndpAdd default 512)")
    p.add_argument("--cl_num_add", type=int, default=3,
                   help="add-clusters: cluster count "
                        "(Eval_ClusterAdd.py:94 default 3)")
    p.add_argument("--cl_num_p", type=int, default=32,
                   help="add-clusters: points per cluster "
                        "(Eval_ClusterAdd.py:92 default 32)")
    p.add_argument("--init_weight", type=float, default=0.0,
                   help="binary-search weight init (0 = family default)")
    p.add_argument("--max_weight", type=float, default=0.0,
                   help="binary-search weight cap (0 = family default)")
    p.add_argument("--num_init", type=int, default=50,
                   help="ISO TSI random-rotation tries "
                        "(reference iso_attack.py default 50)")
    p.add_argument("--iso_lambda", type=float, default=1000.0,
                   help="ISO spectral-penalty weight (reference LAMBDA)")
    p.add_argument("--iso_lockstep", action="store_true",
                   help="batched-Thompson TSI: probe the whole batch "
                        "per bandit round instead of per sample "
                        "(posterior update ORDER deviates from the "
                        "reference's strictly sequential bandit; same "
                        "per-sample probe budget and reward rule)")
    p.add_argument("--top5_attack", action="store_true",
                   help="SIadv top-5 success rule "
                        "(reference SIadv_attack.py:156-158)")
    p.add_argument("--surrogate_model", default="",
                   help="SIadv white-box surrogate (reference "
                        "Eval_SIadv.py:180: surrogate PointNet -> "
                        "target model); empty = use the victim")
    p.add_argument("--surrogate_checkpoint", default="",
                   help="checkpoint for --surrogate_model")
    p.add_argument("--num_samples", type=int, default=0,
                   help="0 = whole dataset")
    p.add_argument("--attack_batch", type=int, default=0,
                   help="run the sweep in fixed-shape chunks of this "
                        "many clouds (0 = one batch): constant device "
                        "memory, one compiled executable for every "
                        "chunk, per-chunk result files in "
                        "<output_dir>/attack_chunks/")
    p.add_argument("--resume", action="store_true",
                   help="with --attack_batch: skip chunks whose result "
                        "file already exists with a matching config "
                        "fingerprint (restart a killed sweep where it "
                        "died)")
    p.add_argument("--cta_target_mode", default="untarget")
    p.add_argument("--cta_penalize_dis", default="none",
                   choices=["none", "chamfer", "hausdorff"],
                   help="'hausdorff' = the CTA_sumloss runner, "
                        "'chamfer' = CTA.py penalize_dis")
    p.add_argument("--cta_beta", type=float, default=1.0)
    p.add_argument("--save_adv", action="store_true")
    p.add_argument("--compute_dtype", default="f32",
                   choices=["f32", "bf16"],
                   help="victim forward precision; bf16 is ~1.9x faster "
                        "on TPU (attack state stays f32 — see BENCH.md "
                        "for the kappa caveat)")
    p.add_argument("--defense", default="none",
                   help="pre-head on the victim: none | sor | srs | dupnet")
    p.add_argument("--defense_checkpoint", default="",
                   help="trained PU-Net weights for --defense dupnet: the "
                        "reference pu-in_1024-up_4.pth or an orbax/npz dir "
                        "(required — a random upsampler does not defend)")
    p.add_argument("--transfer_test", action="store_true",
                   help="evaluate transfer ASR on --trans_model")
    p.add_argument("--all_targets", action="store_true",
                   help="face-probe mode: sweep EVERY class id as the "
                        "impersonation target in one batched run "
                        "(reference Eval_KNN.py:70-101 target loop)")
    p.add_argument("--face_txt", default="",
                   help="single face-probe txt cloud (targeted experiments)")
    p.add_argument("--face_label", type=int, default=105)
    p.add_argument("--target_class", type=int, default=-1,
                   help="targeted mode: attack target class "
                        "(-1 = next class after the truth)")
    # cw-robust (additional_exp) toggles; defaults mirror the reference
    # constructor (additional_exp/CW_attack.py:16-17)
    p.add_argument("--whether_1d", type=int, default=1,
                   help="cw-robust: z-only attack with box clip (0/1)")
    p.add_argument("--box_constraint", type=float, default=0.4,
                   help="cw-robust: z box half-width in 1d mode")
    p.add_argument("--renormalization", type=int, default=0,
                   help="cw-robust: unit-sphere renorm before forward (0/1)")
    p.add_argument("--eot", type=int, default=0,
                   help="cw-robust: average loss over random rotations (0/1)")
    p.add_argument("--resample", type=int, default=0,
                   help="cw-robust: random half-resample before forward (0/1)")
    # geoa3-partial knobs (reference GeoA3_attack.py:259-306)
    # GeoA3 loss knobs (reference Eval_GeoA3.py:147-191 defaults)
    p.add_argument("--cls_loss_type", default="CE",
                   choices=["CE", "Margin", "None"])
    p.add_argument("--confidence", type=float, default=0.0,
                   help="margin confidence (Margin cls loss)")
    p.add_argument("--dis_loss_type", default="CD",
                   choices=["CD", "L2", "None"])
    p.add_argument("--dis_loss_weight", type=float, default=1.0)
    p.add_argument("--is_cd_single_side", type=int, default=0)
    p.add_argument("--hd_loss_weight", type=float, default=0.1)
    p.add_argument("--curv_loss_weight", type=float, default=1.0)
    p.add_argument("--curv_loss_knn", type=int, default=16)
    p.add_argument("--curv_knn_refresh", type=int, default=1,
                   help="recompute the curvature self-kNN every R iters "
                        "(1 = reference per-iteration semantics)")
    p.add_argument("--nn_refresh", type=int, default=1,
                   help="knn family: refresh the Chamfer nearest-point "
                        "index every R iters (1 = reference semantics)")
    p.add_argument("--initial_const", type=float, default=10.0)
    p.add_argument("--use_lr_scheduler", type=int, default=0)
    p.add_argument("--use_jitter", type=int, default=0,
                   help="is_pre_jitter_input twin")
    p.add_argument("--use_offset_proj", type=int, default=0,
                   help="is_real_offset twin (project offsets on normals)")
    p.add_argument("--cc_linf", type=float, default=0.0)
    p.add_argument("--knn_range", type=int, default=16,
                   help="geoa3-partial: patch size")
    p.add_argument("--refresh_iters", type=int, default=50,
                   help="geoa3-partial: iterations between patch refreshes")
    p.add_argument("--subsample_npoint", type=int, default=0,
                   help="geoa3-partial: FPS eval subsample (0 = off)")
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler trace into this dir")
    p.set_defaults(fn=cmd_attack)

    p = add_common_args(sub.add_parser("test-advdata"))
    p.add_argument("--adv_dir", required=True)
    p.set_defaults(fn=cmd_test_advdata)

    p = sub.add_parser("view")
    p.add_argument("--platform", default="",
                   help="accepted on every subcommand so drivers can "
                        "pass it uniformly (view itself runs no jax)")
    p.add_argument("cloud", help="N x 3(+) txt cloud (e.g. an AdvData dump)")
    p.add_argument("--cmds", default="",
                   help="scripted keys (e.g. 'nnjs q'); empty = stdin")
    p.add_argument("--out", default="", help="path for the 's' key frame")
    p.add_argument("--size", type=int, default=256)
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser("make-splits")
    p.add_argument("--platform", default="",
                   help="accepted on every subcommand so drivers can "
                        "pass it uniformly (make-splits itself runs no "
                        "jax)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--ext", default=".bnt")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_make_splits)

    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "platform", None):
        # Must run before the JAX backend initializes; env-var pinning
        # (JAX_PLATFORMS) is unreliable on hosts whose sitecustomize
        # overrides it, so use jax.config like tests/conftest.py does.
        import jax

        jax.config.update("jax_platforms", args.platform)
    from pointcloudattack_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    if getattr(args, "debug_nans", False):
        from pointcloudattack_tpu.utils.logging import enable_debug_nans

        enable_debug_nans()
    return args.fn(args)


if __name__ == "__main__":
    main()
