"""CurveNet CW-iteration anatomy (round-5 verdict task 2).

Per-piece scan-microbench of the ``cw_curvenet`` bench arm (B=8,
N=1024, shipped policy = fully unfused), in the style of the round-4
SSG anatomy (BENCH.md).  Answers "what are the ~22.7 ms/iter actually
spent on": the whole CW step, the model forward and VJP, the no-curves
ablation (all ``curve_cfg=None``), and every distinct sub-op the
forward dispatches — knn, FPS, ball query, CurveGrouping (att+top_k+
Walk), CurveAggregation, LPFA blocks, head — each weighted by its
occurrence count so the per-piece sum can be reconciled against the
measured forward.

Timing: each piece runs as a length-R ``lax.scan`` whose carry feeds an
O(1e-12) function of the output back into the input (serializes reps,
defeats DCE) inside ONE jit — the axon tunnel's ~25 ms dispatch latency
amortizes over R device-side reps.  ``jax.block_until_ready`` does not
block on axon, so runs are fenced by fetching a small reduction.

Usage:  python scripts/bench_curvenet_anatomy.py            (TPU)
        PCA_BENCH_SMOKE=1 PCA_BENCH_PLATFORM=cpu python ... (harness screen)

Reference counterparts being measured: model/curvenet.py:11-73,
model/curvenet_util.py:303-485, model/walk.py:74-152.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

if os.environ.get("PCA_BENCH_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["PCA_BENCH_PLATFORM"])

from pointcloudattack_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudattack_tpu import models
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
from pointcloudattack_tpu.models import curvenet as cn
from pointcloudattack_tpu.ops.ball_query import query_ball_point
from pointcloudattack_tpu.ops.fps import farthest_point_sample
from pointcloudattack_tpu.ops.knn import knn
from pointcloudattack_tpu.utils.apply import make_model_fn

_SMOKE = os.environ.get("PCA_BENCH_SMOKE", "0") == "1"
B, N, K = (2, 256, 8) if _SMOKE else (8, 1024, 20)
R = 3 if _SMOKE else 50
REPS = 2 if _SMOKE else 3
CW_ITERS = 3 if _SMOKE else 100


def _fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def time_scan(fn, x0, r=R, reps=REPS):
    """ms per fn() call: length-r scan with output->input feedback."""

    def body(x, _):
        y = fn(x)
        s = sum(
            jnp.sum(l).astype(jnp.float32)
            for l in jax.tree_util.tree_leaves(y)
        )
        return (x + (s * 1e-12).astype(x.dtype), None)

    run = jax.jit(lambda x: jax.lax.scan(body, x, None, length=r)[0])
    _fence(run(x0))  # compile + first-execute
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(run(x0))
        times.append(time.perf_counter() - t0)
    return min(times) / r * 1e3


def main():
    rows = {}  # name -> (ms_per_call, occurrences_per_forward)
    key = jax.random.PRNGKey(0)
    clouds, labels = make_synthetic_clouds(8, max(1, B // 8), N, seed=9)
    data = jnp.asarray(clouds[:B])
    target = jnp.asarray(labels[:B])

    # ---- whole CW iteration (matches bench.py cw_curvenet arm) ----
    model = models.make_model("CurveNet", 40)
    variables = models.init_model(model, key, num_points=N, batch=2)
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(
        binary_step=1, num_iter=CW_ITERS, kappa=30.0, budget=0.18
    )
    attack = build_cw_attack(model_fn, cfg)
    _fence(attack(data, target, jax.random.PRNGKey(1)).best_dist)
    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        _fence(attack(data, target, jax.random.PRNGKey(2 + i)).best_dist)
        times.append(time.perf_counter() - t0)
    rows["cw_iter"] = (min(times) / CW_ITERS * 1e3, 1)

    # ---- model forward / VJP, default vs no-curves ablation ----
    def grad_fn(f):
        return jax.grad(lambda x: jnp.sum(f(x)[:, 0]))

    rows["model_fwd"] = (time_scan(model_fn, data), 1)
    rows["model_vjp"] = (time_scan(grad_fn(model_fn), data), 1)

    cn.CURVE_CONFIG["none"] = [None, None, None, None]
    nomodel = cn.CurveNet(num_classes=40, setting="none")
    novars = models.init_model(nomodel, key, num_points=N, batch=2)
    no_fn = make_model_fn(nomodel, novars)
    rows["model_fwd_nocurves"] = (time_scan(no_fn, data), 1)
    rows["model_vjp_nocurves"] = (time_scan(grad_fn(no_fn), data), 1)

    # ---- sub-ops at the forward's exact shapes ----
    xyz = data  # [B, N, 3]
    # knn(k+1) at each resolution (cic11/12/21/22 at N, 31/32 at N/4,
    # 41/42 at N/16; the initial LPFA's knn is k+1 at N too)
    n4, n16 = N // 4, N // 16
    rows[f"knn_n{N}_k{K + 1}"] = (
        time_scan(lambda x: knn(x, K + 1), xyz), 5,
    )
    x4 = xyz[:, :n4]
    x16 = xyz[:, :n16]
    rows[f"knn_n{n4}"] = (time_scan(lambda x: knn(x, K + 1), x4), 2)
    rows[f"knn_n{n16}"] = (time_scan(lambda x: knn(x, K + 1), x16), 2)

    # FPS + ball query (MaskedMaxPool of cic31 and cic41)
    rows[f"fps_{N}_to_{n4}"] = (
        time_scan(lambda x: farthest_point_sample(x, n4, key=None), xyz),
        1,
    )
    rows[f"fps_{n4}_to_{n16}"] = (
        time_scan(lambda x: farthest_point_sample(x, n16, key=None), x4),
        1,
    )
    rows[f"ballq_{N}_to_{n4}"] = (
        time_scan(lambda x: query_ball_point(0.1, K, x, x[:, :n4]), xyz),
        1,
    )
    rows[f"ballq_{n4}_to_{n16}"] = (
        time_scan(lambda x: query_ball_point(0.2, K, x, x[:, :n16]), x4),
        1,
    )

    # CurveGrouping (sigmoid att + top_k + Walk) and CurveAggregation
    # at the two channel widths that run them (planes = 16 for
    # cic11/12, 32 for cic21/22), cn=100, cl=5
    adj = knn(xyz, K + 1)[:, :, 1:]
    for c, blocks in ((16, 2), (32, 2)):
        h = jax.random.normal(key, (B, N, c), jnp.float32)
        cg = cn.CurveGrouping(K, 100, 5)
        cgv = cg.init(key, h, xyz, adj, train=False)
        rows[f"curvegroup_c{c}"] = (
            time_scan(
                lambda x, cg=cg, cgv=cgv: cg.apply(
                    cgv, x, xyz, adj, train=False
                ),
                h,
            ),
            blocks,
        )
        curves = jax.random.normal(key, (B, 100, 5, c), jnp.float32)
        ca = cn.CurveAggregation()
        cav = ca.init(key, h, curves, train=False)
        rows[f"curveagg_c{c}"] = (
            time_scan(
                lambda x, ca=ca, cav=cav: ca.apply(
                    cav, x, curves, train=False
                ),
                h,
            ),
            blocks,
        )

    # LPFA blocks: the initial embedding + each residual width
    lp0 = cn.LPFA(32, k=K, mlp_num=1, initial=True)
    lp0v = lp0.init(key, None, xyz, train=False)
    rows["lpfa_initial"] = (
        time_scan(
            lambda x: lp0.apply(lp0v, None, x, train=False), xyz
        ),
        1,
    )
    for name, n, c, blocks in (
        (f"lpfa_res_n{N}_c16", N, 16, 2),
        (f"lpfa_res_n{N}_c32", N, 32, 2),
        (f"lpfa_res_n{n4}_c64", n4, 64, 2),
        (f"lpfa_res_n{n16}_c128", n16, 128, 2),
    ):
        xz = xyz[:, :n]
        h = jax.random.normal(key, (B, n, c), jnp.float32)
        idx = knn(xz, K + 1)[:, :, :K]
        lp = cn.LPFA(c, k=K, mlp_num=1)
        lpv = lp.init(key, h, xz, idx=idx, train=False)
        rows[name] = (
            time_scan(
                lambda x, lp=lp, lpv=lpv, xz=xz, idx=idx: lp.apply(
                    lpv, x, xz, idx=idx, train=False
                ),
                h,
            ),
            blocks,
        )

    # conv1/conv2 bottleneck denses of all 8 CICs, the head, and the
    # per-CIC shortcut denses are lumped: measure the head once
    def head(h):
        # stand-in with the exact head shapes (Dense 512->1024 at
        # n16 points, pools, 512, 40) using random weights
        w0 = jax.random.normal(key, (512, 1024), jnp.float32) * 0.01
        w1 = jax.random.normal(key, (2048, 512), jnp.float32) * 0.01
        w2 = jax.random.normal(key, (512, 40), jnp.float32) * 0.01
        g = jax.nn.relu(h @ w0)
        g = jnp.concatenate([jnp.max(g, 1), jnp.mean(g, 1)], -1)
        return jax.nn.relu(g @ w1) @ w2

    rows["head"] = (
        time_scan(head, jax.random.normal(key, (B, n16, 512), jnp.float32)),
        1,
    )

    # ---- report ----
    fwd = rows["model_fwd"][0]
    acc = sum(ms * w for name, (ms, w) in rows.items()
              if name not in ("cw_iter", "model_fwd", "model_vjp",
                              "model_fwd_nocurves", "model_vjp_nocurves"))
    print(f"{'piece':<28}{'ms/call':>9}{'x':>4}{'ms/fwd':>9}{'% fwd':>7}")
    for name, (ms, w) in sorted(
        rows.items(), key=lambda kv: -kv[1][0] * kv[1][1]
    ):
        tot = ms * w
        print(f"{name:<28}{ms:>9.3f}{w:>4}{tot:>9.3f}{tot / fwd:>6.1%}")
    print(f"{'sum of sub-ops':<28}{'':>9}{'':>4}{acc:>9.3f}{acc / fwd:>6.1%}")
    out = {k: {"ms": round(v[0], 4), "count": v[1]} for k, v in rows.items()}
    out["sum_subops_ms"] = round(acc, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
