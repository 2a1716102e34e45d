"""Headline benchmark: adversarial clouds/sec/chip for 200-step CW on
PointNet (1024 points), the BASELINE.json north-star config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured throughput / 1.0 (the BASELINE.json target of
>= 1 adv cloud/sec/chip for the same config — the reference publishes no
numbers of its own, see BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudattack_tpu import models
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
from pointcloudattack_tpu.utils.apply import make_model_fn

NUM_CLASSES = 40
NUM_POINTS = 1024
BATCH = 64  # throughput peak on v5e (see batch sweep: 64 > 32/128/256)
NUM_ITER = 200
BINARY_STEPS = 1  # 200 optimization steps total, per the baseline config


def main():
    clouds, labels = make_synthetic_clouds(
        NUM_CLASSES, max(1, BATCH // NUM_CLASSES + 1), NUM_POINTS, seed=0
    )
    data = jnp.asarray(clouds[:BATCH])
    target = jnp.asarray(labels[:BATCH])

    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=BATCH
    )
    model_fn = make_model_fn(model, variables)

    cfg = CWPerturbConfig(
        binary_step=BINARY_STEPS, num_iter=NUM_ITER, kappa=30.0, budget=0.18
    )
    attack = build_cw_attack(model_fn, cfg)

    key = jax.random.PRNGKey(1)
    # compile + warm up
    res = attack(data, target, key)
    jax.block_until_ready(res.best_attack)

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        res = attack(data, target, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(res.best_attack)
    dt = (time.perf_counter() - t0) / reps

    clouds_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "adv_clouds_per_sec_per_chip_cw200_pointnet_1024",
                "value": round(clouds_per_sec, 3),
                "unit": "clouds/s",
                "vs_baseline": round(clouds_per_sec / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
