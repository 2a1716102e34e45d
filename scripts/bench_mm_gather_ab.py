"""A/B of the scatter-free gather VJP on CurveNet (round-5 verdict
task 2 follow-through).

The round-5 anatomy (BENCH.md "CurveNet anatomy") pinned the CW
iteration on the model VJP: 23.1 ms vs a 6.1 ms forward at [8, 1024] —
the ~20 differentiated neighbour gathers whose backward XLA lowers as
scatter-adds.  models/curvenet.py routes them through
ops/gather.py::index_points_mm_bwd (one-hot transpose-matmul VJP, the
trade GeoA3 measured 4.9x on in round 3) when
FUSED_POLICY["curvenet"]["mm_bwd"] is on.  This script measures the
full ``cw_curvenet`` bench family with the tier forced off/on in two
subprocesses (PCA_MM_GATHER_BWD=0/1) and prints the comparison JSON
that decides the shipped policy default.

Usage: python scripts/bench_mm_gather_ab.py [--inner 0|1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_inner() -> None:
    import bench

    fam = bench.bench_cw_curvenet()
    print("INNER_JSON " + json.dumps(fam))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", default="")
    args = ap.parse_args()
    if args.inner:
        run_inner()
        return

    out = {}
    for flag in ("0", "1"):
        env = dict(os.environ, PCA_MM_GATHER_BWD=flag)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", "x"],
            capture_output=True, text=True, env=env, timeout=4200,
        )
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("INNER_JSON ")]
        key = "mm_bwd_on" if flag == "1" else "scatter_add"
        if r.returncode != 0 or not line:
            out[key] = {"error": (r.stderr or r.stdout)[-2000:]}
            continue
        out[key] = json.loads(line[0][len("INNER_JSON "):])
    if all("error" not in v for v in out.values()):
        out["speedup"] = round(
            out["mm_bwd_on"]["clouds_per_sec"]
            / out["scatter_add"]["clouds_per_sec"], 3
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
