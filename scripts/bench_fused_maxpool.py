"""A/B the fused MLP-chain+maxpool kernel on the CW headline config.

Runs the 200-iter CW attack (PointNet, B=64, N=1024) and a bare
forward/backward decomposition with the fused kernel ON (default) and
OFF (PCA_FUSED_MAXPOOL=0 re-exec), printing clouds/s for both.

Usage:  python scripts/bench_fused_maxpool.py            # both arms
        python scripts/bench_fused_maxpool.py --arm on   # one arm
        python scripts/bench_fused_maxpool.py --victim ssg  # grouped-SA
                                                    # A/B (f32 only)

--victim ssg/dgcnn exist to answer the deferred-optimization questions
in CLAUDE.md: whether the grouped fused chain pays on PointNet++ SA
(and hence whether in-kernel gather fusion is worth pursuing), and the
EdgeConv win on DGCNN.  Heavy victims A/B f32 only at B=16 to bound
axon first-execution cost (each arm is a distinct server executable).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# invoked as `python scripts/bench_fused_maxpool.py`, sys.path[0] is
# scripts/ — the package lives at the repo root (no installer)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


VICTIMS = {
    # name -> (model key, batch, iters, dtypes)
    "pointnet": ("PointNet", 64, 200, ("f32", "bf16")),
    "ssg": ("PointNet++Ssg", 16, 100, ("f32",)),
    "msg": ("PointNet++Msg", 8, 100, ("f32",)),
    "dgcnn": ("DGCNN", 16, 100, ("f32",)),
    "curvenet": ("CurveNet", 8, 100, ("f32",)),
}

# grouped-op victims with the in-kernel gather fusion wired: these get
# a third gather_on arm (CurveNet: initial LPFA + CIC blocks)
_GATHER_VICTIMS = ("ssg", "msg", "dgcnn", "curvenet")

# PCA_BENCH_SMOKE=1 + PCA_BENCH_PLATFORM=cpu: tiny harness screen (see
# bench.py) — validates all arms build/run without the TPU
_SMOKE = os.environ.get("PCA_BENCH_SMOKE", "0") == "1"


def run_arm(victim: str = "pointnet") -> dict:
    if os.environ.get("PCA_BENCH_PLATFORM"):
        import jax

        jax.config.update(
            "jax_platforms", os.environ["PCA_BENCH_PLATFORM"]
        )
    from pointcloudattack_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.attacks.cw import (
        CWPerturbConfig,
        build_cw_attack,
    )
    from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
    from pointcloudattack_tpu.utils.apply import make_model_fn

    model_key, B, ITERS, dtypes = VICTIMS[victim]
    N = 1024
    if _SMOKE:
        B, ITERS, N = 4, 3, 128
    clouds, labels = make_synthetic_clouds(40, 2, N, seed=0)
    data = jnp.asarray(clouds[:B])
    target = jnp.asarray(labels[:B])
    model = models.make_model(model_key, 40)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=N, batch=B
    )

    out = {}
    for tag in dtypes:
        dtype = jnp.bfloat16 if tag == "bf16" else None
        model_fn = make_model_fn(model, variables, compute_dtype=dtype)
        attack = build_cw_attack(
            model_fn,
            CWPerturbConfig(
                binary_step=1, num_iter=ITERS, kappa=30.0, budget=0.18
            ),
        )
        res = attack(data, target, jax.random.PRNGKey(0))
        np.asarray(res.best_dist)  # compile + warm
        asr = float(np.mean(np.asarray(res.success)))
        t0 = time.perf_counter()
        outs = [
            attack(data, target, jax.random.PRNGKey(1 + i)) for i in range(3)
        ]
        np.asarray(outs[-1].best_dist)
        dt = (time.perf_counter() - t0) / 3
        out[tag] = {
            "clouds_per_sec": round(B / dt, 1),
            "ms_per_iter": round(dt / ITERS * 1e3, 3),
            "asr": asr,
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["on", "off"], default=None)
    ap.add_argument("--victim", choices=sorted(VICTIMS), default="pointnet")
    args = ap.parse_args()
    if args.arm is not None:
        print(json.dumps({args.arm: run_arm(args.victim)}))
        return
    results = {"victim": args.victim}
    # control arms PIN the gather knob off — inheriting an exported
    # PCA_FUSED_GATHER=1 would make gather_on and fused_on measure the
    # same configuration and zero out the A/B delta
    arms = [
        ("fused_on",
         {"PCA_FUSED_MAXPOOL": "1", "PCA_FUSED_GATHER": "0"}),
        ("fused_off",
         {"PCA_FUSED_MAXPOOL": "0", "PCA_FUSED_GATHER": "0"}),
    ]
    if args.victim in _GATHER_VICTIMS:
        # in-kernel gather fusion rides on top of the fused chain —
        # only meaningful for grouped victims
        arms.insert(0, (
            "gather_on",
            {"PCA_FUSED_MAXPOOL": "1", "PCA_FUSED_GATHER": "1"},
        ))
    for arm, env in arms:
        e = dict(os.environ, **env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", "on",
             "--victim", args.victim],
            env=e, capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        results[arm] = json.loads(line[-1])["on"] if line else {
            "error": p.stderr[-300:]
        }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
