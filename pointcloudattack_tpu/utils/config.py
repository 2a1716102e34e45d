"""Shared typed configuration for all CLIs.

Replaces the reference's per-script argparse duplication (every Eval_*.py
re-declares model/dataset/DGCNN flags — SURVEY.md §5.6) with one dataclass
constructed from one argparse parent parser.
"""

from __future__ import annotations

import argparse
import dataclasses


@dataclasses.dataclass
class RunConfig:
    model: str = "PointNet"
    trans_model: str = "PointNet++Msg"
    dataset: str = "synthetic"
    dataset_path: str = ""
    num_points: int = 1024
    num_classes: int = 0  # 0 = infer from dataset
    batch_size: int = 8
    seed: int = 0
    checkpoint: str = ""
    trans_checkpoint: str = ""
    output_dir: str = "runs"
    # DGCNN hyperparameters (reference train.py:53-57)
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    gather_mode: str = "auto"  # DGCNN: auto | exact | tri | hilo | bf16
    feature_transform: bool = False


def add_common_args(parser: argparse.ArgumentParser):
    d = RunConfig()
    parser.add_argument("--model", default=d.model,
                        help="PointNet | PointNet++Ssg | PointNet++Msg | "
                             "DGCNN | CurveNet")
    parser.add_argument("--trans_model", default=d.trans_model)
    parser.add_argument("--dataset", default=d.dataset,
                        help="synthetic | Bosphorus | Eurecom | ModelNet | "
                             "ShapeNet")
    parser.add_argument("--dataset_path", default=d.dataset_path,
                        help="csv path (faces) or dataset root")
    parser.add_argument("--num_points", type=int, default=d.num_points)
    parser.add_argument("--num_classes", type=int, default=d.num_classes)
    parser.add_argument("--batch_size", type=int, default=d.batch_size)
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--checkpoint", default=d.checkpoint)
    parser.add_argument("--trans_checkpoint", default=d.trans_checkpoint)
    parser.add_argument("--output_dir", default=d.output_dir)
    parser.add_argument("--k", type=int, default=d.k)
    parser.add_argument("--emb_dims", type=int, default=d.emb_dims)
    parser.add_argument("--dropout", type=float, default=d.dropout)
    parser.add_argument("--gather_mode", default=d.gather_mode,
                        help="DGCNN neighbour gather: auto (tri on TPU, exact elsewhere) | exact | tri | hilo | bf16")
    parser.add_argument("--feature_transform", action="store_true")
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "gpu"],
                        help="pin the JAX backend (jax.config "
                             "jax_platforms) before first use; needed "
                             "because some hosts override JAX_PLATFORMS "
                             "via sitecustomize (CLAUDE.md gotchas). "
                             "Default: JAX's own platform selection")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans — the moral "
                             "equivalent of the reference's dist-matrix "
                             "sanity asserts (SOR.py:39), SURVEY §5.2")
    return parser


def run_config_from_args(args: argparse.Namespace) -> RunConfig:
    fields = {f.name for f in dataclasses.fields(RunConfig)}
    return RunConfig(
        **{k: v for k, v in vars(args).items() if k in fields}
    )
