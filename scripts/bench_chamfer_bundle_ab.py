"""A/B: GeoA3 full-iteration VJP with the two-direction chamfer kernel
vs the dense XLA bundle, B=8 and B=32 (decision data for the
use_both_kernel gate at GeoA3's shapes; anatomy2/3 logs suggested the
dense bundle is ~0.06 ms/iter faster in isolation at B=8)."""
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudattack_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
from pointcloudattack_tpu import models
from pointcloudattack_tpu.attacks.geoa3 import GeoA3Config, _constraint_loss
from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
from pointcloudattack_tpu.geometry.normals import estimate_normal
from pointcloudattack_tpu.losses.adv import untargeted_logits_adv_loss
from pointcloudattack_tpu.losses.geometry import kappa_ori
from pointcloudattack_tpu.ops.pallas import chamfer_kernel as CK
from pointcloudattack_tpu.utils.apply import make_model_fn

K = 200  # scan iters per timed call
N = 1024
cfg = GeoA3Config()


def run(b, force_dense):
    clouds, labels = make_synthetic_clouds(b, 1, N, seed=5)
    ori = jnp.asarray(clouds[:b])
    target = jnp.asarray(labels[:b])
    model = models.make_model("PointNet", 40)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=N, batch=b
    )
    model_fn = make_model_fn(model, variables)
    normal_ori = estimate_normal(ori, k=cfg.normal_k)
    k_ori = kappa_ori(ori, normal_ori, cfg.curv_loss_knn)
    off0 = 0.001 * jax.random.normal(jax.random.PRNGKey(1), ori.shape)

    orig = CK.use_both_kernel
    if force_dense:
        CK.use_both_kernel = lambda n, m: False
    try:
        def full(o):
            a = ori + o
            lg = model_fn(a)
            cons = _constraint_loss(a, ori, normal_ori, k_ori, cfg)
            return jnp.sum(
                untargeted_logits_adv_loss(lg, target, 0.0) + 10.0 * cons
            )

        def body(off, _):
            g = jax.grad(full)(off)
            return off + 1e-12 * g, ()

        f = jax.jit(lambda o: jax.lax.scan(body, o, None, length=K)[0])
        np.asarray(f(off0))  # compile + server first-execute, fenced out
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(off0))
            times.append(time.perf_counter() - t0)
    finally:
        CK.use_both_kernel = orig
    per_iter = min(times) / K * 1e3
    reps = " ".join(f"{t / K * 1e3:.3f}" for t in times)
    arm = "dense " if force_dense else "kernel"
    print(f"B={b:3d} {arm}  {per_iter:8.3f} ms/iter  (reps: {reps})",
          flush=True)
    return per_iter


for b in (8, 32):
    for dense in (False, True):
        run(b, dense)


# knn-attack shape: the per-iter differentiated symmetric Chamfer alone
# (losses/distance.py::chamfer_both), B=32 — kernel = fused two-direction
# pass, fallback = two single-direction min_sqdist_rows kernels (the
# round-3 path; BENCH_r03 knn 9.012 vs bench_r4c 8.124 suggests the
# fused pass LOSES here)
from pointcloudattack_tpu.losses.distance import chamfer_both


def run_knn_chamfer(force_dense):
    b = 32
    clouds, _ = make_synthetic_clouds(b, 1, N, seed=7)
    ori = jnp.asarray(clouds[:b])
    off0 = 0.001 * jax.random.normal(jax.random.PRNGKey(2), ori.shape)
    orig = CK.use_both_kernel
    if force_dense:
        CK.use_both_kernel = lambda n, m: False
    try:
        def loss(o):
            a2o, o2a = chamfer_both(ori + o, ori)
            return jnp.sum(a2o + o2a)

        def body(off, _):
            return off + 1e-12 * jax.grad(loss)(off), ()

        f = jax.jit(lambda o: jax.lax.scan(body, o, None, length=K)[0])
        np.asarray(f(off0))
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(off0))
            times.append(time.perf_counter() - t0)
    finally:
        CK.use_both_kernel = orig
    per_iter = min(times) / K * 1e3
    reps = " ".join(f"{t / K * 1e3:.3f}" for t in times)
    arm = "2x-rows" if force_dense else "both   "
    print(f"knn-chamfer B=32 {arm}  {per_iter:8.3f} ms/iter  (reps: {reps})",
          flush=True)


for dense in (False, True):
    run_knn_chamfer(dense)
