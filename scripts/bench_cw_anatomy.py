"""CW/PointNet headline-iteration anatomy (round-5 verdict task 8).

BENCH.md's round-4 reconciliation showed the fused chain kernel removed
~40% of the CW iteration; this script measures where the remaining time
goes, piece by piece, at the EXACT headline config (bench.py cw arm:
B=64, N=1024, PointNet, kappa=30, 1x200 schedule, shipped policy =
chain ON f32):

  cw_iter        — whole attack wall / iters
  engine_lump    — the same engine (scan + Adam + margin/L2 losses +
                   clip + best tracking) driven by a near-free linear
                   model: the iteration cost that is NOT the model
  model_fwd/vjp  — the full PointNet forward / input-grad
  stn_fwd/vjp    — the STN3d submodule alone ([B, N, 3] -> [3, 3])
  chain_fwd/vjp  — the fused 3->64->128->1024+max spine alone
  head_fwd       — the 1024->512->256->40 classifier head alone

Timing: length-R lax.scan with output->input feedback inside one jit
(amortizes the axon ~25 ms dispatch latency), min over reps, fenced by
a 1-element fetch (jax.block_until_ready does not block on axon).

Usage:  python scripts/bench_cw_anatomy.py            (TPU)
        PCA_BENCH_SMOKE=1 PCA_BENCH_PLATFORM=cpu ...  (harness screen)

Reference counterpart being measured: attack/CW/CW_attack.py:57-260
driving model/pointnet.py:88-140.
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
from pointcloudattack_tpu.utils.apply import make_model_fn

_SMOKE = os.environ.get("PCA_BENCH_SMOKE", "0") == "1"
B, N = (4, 128) if _SMOKE else (64, 1024)
R = 3 if _SMOKE else 50
REPS = 2 if _SMOKE else 3
CW_ITERS = 3 if _SMOKE else 200


def _fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def time_scan(fn, x0, r=R, reps=REPS):
    def body(x, _):
        y = fn(x)
        s = sum(
            jnp.sum(l).astype(jnp.float32)
            for l in jax.tree_util.tree_leaves(y)
        )
        return (x + (s * 1e-12).astype(x.dtype), None)

    run = jax.jit(lambda x: jax.lax.scan(body, x, None, length=r)[0])
    _fence(run(x0))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(run(x0))
        times.append(time.perf_counter() - t0)
    return min(times) / r * 1e3


def time_attack(attack, data, target, iters):
    _fence(attack(data, target, jax.random.PRNGKey(1)).best_dist)
    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        _fence(attack(data, target, jax.random.PRNGKey(2 + i)).best_dist)
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1e3


def main():
    rows = {}
    key = jax.random.PRNGKey(0)
    clouds, labels = make_synthetic_clouds(
        8, max(1, B // 8), N, seed=0
    )
    data = jnp.asarray(clouds[:B])
    target = jnp.asarray(labels[:B])

    model = models.make_model("PointNet", 40)
    variables = models.init_model(
        model, key, num_points=N, batch=B
    )
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(
        binary_step=1, num_iter=CW_ITERS, kappa=30.0, budget=0.18
    )
    rows["cw_iter"] = time_attack(
        build_cw_attack(model_fn, cfg), data, target, CW_ITERS
    )

    # engine without the model: near-free linear logits
    wlin = jax.random.normal(key, (3, 40), jnp.float32) * 0.01

    def trivial_fn(a):
        return a[:, 0, :] @ wlin

    rows["engine_lump"] = time_attack(
        build_cw_attack(jax.jit(trivial_fn), cfg), data, target, CW_ITERS
    )

    def grad_fn(f):
        return jax.grad(lambda x: jnp.sum(f(x)[:, 0]))

    rows["model_fwd"] = time_scan(model_fn, data)
    rows["model_vjp"] = time_scan(grad_fn(model_fn), data)

    # STN3d alone
    from pointcloudattack_tpu.models.pointnet import STN

    stn = STN(k=3)
    stn_vars = {
        "params": variables["params"]["feat"]["stn"],
        "batch_stats": variables["batch_stats"]["feat"]["stn"],
    }
    stn_fn = lambda x: stn.apply(stn_vars, x, train=False)
    rows["stn_fwd"] = time_scan(stn_fn, data)
    rows["stn_vjp"] = time_scan(
        jax.grad(lambda x: jnp.sum(stn_fn(x))), data
    )

    # the fused 3->64->128->1024+max spine alone (shipped policy path)
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        mlp_chain_maxpool,
    )

    feat = variables["params"]["feat"]
    fstat = variables["batch_stats"]["feat"]

    def _layer(name):
        pd, st = feat[name], fstat[name]
        mul = jax.lax.rsqrt(st["bn0"]["var"] + 1e-5) * pd["bn0"]["scale"]
        return (
            pd["dense0"]["kernel"], pd["dense0"]["bias"],
            st["bn0"]["mean"], mul, pd["bn0"]["bias"],
        )

    layers = tuple(_layer(n) for n in ("mlp1", "mlp2", "mlp3"))
    # the CPU smoke runs the kernel through the interpreter (timing is
    # meaningless there — the smoke only validates the script)
    chain_fn = lambda x: mlp_chain_maxpool(x, layers, _SMOKE)
    rows["chain_fwd"] = time_scan(chain_fn, data)
    rows["chain_vjp"] = time_scan(
        jax.grad(lambda x: jnp.sum(chain_fn(x))), data
    )

    # classifier head alone (1024 -> 512 -> 256 -> 40)
    gf = jax.random.normal(key, (B, 1024), jnp.float32)
    p = variables["params"]

    def head_fn(h):
        h = h @ p["fc1"]["dense0"]["kernel"] + p["fc1"]["dense0"]["bias"]
        h = jax.nn.relu(h)
        h = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        h = jax.nn.relu(h)
        return h @ p["fc3"]["kernel"] + p["fc3"]["bias"]

    rows["head_fwd"] = time_scan(head_fn, gf)

    print(f"{'piece':<16}{'ms':>9}{'% iter':>8}")
    it = rows["cw_iter"]
    for name, ms in sorted(rows.items(), key=lambda kv: -kv[1]):
        print(f"{name:<16}{ms:>9.3f}{ms / it:>7.1%}")
    print(json.dumps({k: round(v, 4) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
