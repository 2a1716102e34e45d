"""Metrics accumulation and attack-evaluation summaries.

Counterparts of the reference's AverageMeter
(attack/CW/CW_utils/basic_util.py:58-74), the per-run ASR / transfer /
query-cost printouts (attack/SIadv/Eval_SIadv.py:130-157), and the ISO
CSV row logger (attack/ISO/iso_utils.py:136-138).
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import time
from typing import Iterable

import numpy as np


class AverageMeter:
    """Running mean/sum tracker."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


@dataclasses.dataclass
class AttackStats:
    """Reference-style attack counters (attack/CW/CW_attack.py:53-55)."""

    total: int = 0
    success: int = 0
    attack_fail: int = 0
    shuffle_fail: int = 0
    trans_fail: int = 0
    queries: int = 0
    wall_clock_s: float = 0.0

    def update(self, success_mask, shuffle_ok=None, trans_ok=None,
               queries=None, wall_clock_s: float = 0.0):
        m = np.asarray(success_mask)
        self.total += int(m.size)
        self.success += int(m.sum())
        self.attack_fail += int((~m).sum())
        if shuffle_ok is not None:
            self.shuffle_fail += int((~np.asarray(shuffle_ok)).sum())
        if trans_ok is not None:
            self.trans_fail += int((~np.asarray(trans_ok)).sum())
        if queries is not None:
            self.queries += int(np.asarray(queries).sum())
        self.wall_clock_s += wall_clock_s

    @property
    def asr(self) -> float:
        return self.success / max(self.total, 1)

    def summary(self) -> dict:
        return {
            "total": self.total,
            "success": self.success,
            "asr": self.asr,
            "attack_fail": self.attack_fail,
            "shuffle_fail": self.shuffle_fail,
            "trans_fail": self.trans_fail,
            "mean_queries": self.queries / max(self.total, 1),
            "wall_clock_s": self.wall_clock_s,
        }


def imperceptibility_metrics(adv, ori) -> dict:
    """MSE / Chamfer / Hausdorff / perturbed-point count per run.

    Reference attack/SIadv/Eval_SIadv.py:140-157 (the reference scales
    MSE by sqrt(3*1024); we report both raw and scaled).
    """
    import jax.numpy as jnp

    from pointcloudattack_tpu.losses.distance import (
        chamfer_dist,
        hausdorff_dist,
    )

    adv = np.asarray(adv)
    ori = np.asarray(ori)
    n = ori.shape[1]
    mse = float(np.sqrt(((adv - ori) ** 2).mean()))
    moved = int((np.abs(adv - ori).max(-1) > 1e-6).sum())
    cd = float(np.mean(np.asarray(chamfer_dist(jnp.asarray(adv), jnp.asarray(ori)))))
    hd = float(np.mean(np.asarray(hausdorff_dist(jnp.asarray(adv), jnp.asarray(ori)))))
    return {
        "mse": mse,
        "mse_scaled": mse * np.sqrt(3 * n),
        "chamfer": cd,
        "hausdorff": hd,
        "num_perturbed_points": moved,
    }


class CsvLogger:
    """Append-rows CSV logger (reference iso_utils.log_row)."""

    def __init__(self, path: str, header: Iterable[str]):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        new = not os.path.exists(path)
        self._f = open(path, "a", newline="")
        self._w = csv.writer(self._f)
        if new:
            self._w.writerow(list(header))
            self._f.flush()

    def log(self, row: Iterable):
        self._w.writerow(list(row))
        self._f.flush()

    def close(self):
        self._f.close()


class StageTimer:
    """Per-stage wall-clock accumulator (reference attack loops print
    forward/backward/update/clip timings, CW_attack.py:105-177).

    On TPU the device timeline is what matters; for that use
    ``jax.profiler.trace`` — this timer covers host-visible stages.
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._t0 = None
        self._stage = None

    def start(self, stage: str):
        now = time.perf_counter()
        if self._stage is not None:
            self.totals[self._stage] = (
                self.totals.get(self._stage, 0.0) + now - self._t0
            )
        self._stage, self._t0 = stage, now

    def stop(self):
        self.start("__idle__")
        self._stage = None

    def summary(self) -> dict:
        return {k: v for k, v in self.totals.items() if k != "__idle__"}


def write_json(path: str, obj: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)
