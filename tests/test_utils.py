"""Utils tests: metrics, loggers, timers, profiling helpers."""

import os

import numpy as np

from pointcloudattack_tpu.utils import metrics
from pointcloudattack_tpu.utils.logging import RunLogger
from pointcloudattack_tpu.utils.profiling import wall_clock


class TestAverageMeter:
    def test_running_stats(self):
        m = metrics.AverageMeter()
        m.update(1.0)
        m.update(3.0, n=3)
        assert m.val == 3.0
        assert m.count == 4
        assert m.avg == (1.0 + 9.0) / 4


class TestAttackStats:
    def test_counters(self):
        s = metrics.AttackStats()
        s.update(
            np.array([True, False, True]),
            shuffle_ok=np.array([True, True, False]),
            trans_ok=np.array([False, True, True]),
            queries=np.array([10, 20, 30]),
            wall_clock_s=1.5,
        )
        summary = s.summary()
        assert summary["total"] == 3
        assert summary["success"] == 2
        assert abs(summary["asr"] - 2 / 3) < 1e-9
        assert summary["shuffle_fail"] == 1
        assert summary["trans_fail"] == 1
        assert summary["mean_queries"] == 20.0


class TestImperceptibility:
    def test_metrics_zero_for_identical(self):
        pc = np.random.RandomState(0).randn(2, 32, 3).astype(np.float32)
        out = metrics.imperceptibility_metrics(pc, pc)
        assert out["mse"] == 0.0
        assert out["num_perturbed_points"] == 0
        assert out["chamfer"] < 1e-6


class TestCsvLogger:
    def test_append_rows(self, tmp_path):
        path = str(tmp_path / "log.csv")
        log = metrics.CsvLogger(path, ["a", "b"])
        log.log([1, 2])
        log.log([3, 4])
        log.close()
        # append mode: reopening must not duplicate the header
        log = metrics.CsvLogger(path, ["a", "b"])
        log.log([5, 6])
        log.close()
        lines = open(path).read().strip().splitlines()
        assert lines[0] == "a,b"
        assert len(lines) == 4


class TestStageTimer:
    def test_accumulates(self):
        t = metrics.StageTimer()
        t.start("fwd")
        t.start("bwd")
        t.stop()
        s = t.summary()
        assert set(s) == {"fwd", "bwd"}
        assert all(v >= 0 for v in s.values())


def test_run_logger(tmp_path, capsys):
    path = str(tmp_path / "run.log")
    log = RunLogger(path, echo=False)
    log.log("hello")
    log.close()
    assert "hello" in open(path).read()


def test_wall_clock():
    out = []
    with wall_clock("stage", sink=out.append):
        pass
    assert out and out[0].startswith("stage:")
