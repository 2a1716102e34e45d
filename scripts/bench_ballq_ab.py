"""A/B of the in-kernel ball query on SSG/MSG (round-5 verdict task 3).

Both arms run the shipped chain+gather policy; the B arm additionally
routes every eligible set abstraction through
ball_gather_chain_groupmax (PCA_FUSED_BALLQ=1), eliminating the
[B, S, N, K] slot one-hot of ops/ball_query.py's MXU path (~0.5 GB/iter
— the SSG forward's measured bound, BENCH.md anatomy).  Full bench.py
cw_ssg / cw_msg families per arm, each in its own subprocess.

Usage: python scripts/bench_ballq_ab.py [--inner 0|1]
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

    out = {
        "cw_ssg": bench.bench_cw_ssg(),
        "cw_msg": bench.bench_cw_msg(),
    }
    print("INNER_JSON " + json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", default="")
    args = ap.parse_args()
    if args.inner:
        run_inner()
        return

    out = {}
    for flag in ("0", "1"):
        env = dict(os.environ, PCA_FUSED_BALLQ=flag)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", "x"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("INNER_JSON ")]
        key = "ballq_on" if flag == "1" else "ballq_off"
        if r.returncode != 0 or not line:
            out[key] = {"error": (r.stderr or r.stdout)[-2000:]}
            continue
        out[key] = json.loads(line[0][len("INNER_JSON "):])
    if all("error" not in v for v in out.values()):
        for fam in ("cw_ssg", "cw_msg"):
            out[f"{fam}_speedup"] = round(
                out["ballq_on"][fam]["clouds_per_sec"]
                / out["ballq_off"][fam]["clouds_per_sec"], 3
            )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
