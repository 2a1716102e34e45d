"""N-axis scaling of the attack hot path (run on the TPU).

The reference caps clouds at ~10k points and materializes O(N*M)
pairwise matrices (SURVEY.md §5.7); here Chamfer rides the tiled Pallas
kernel (O(N+M) HBM) above 4096^2 pairwise entries, so the KNN attack
keeps scaling. Measures 100-step CW (L2) and KNN (Chamfer) per N.

Timing: enqueue-and-fence like bench.py (block_until_ready does not
block through the axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointcloudattack_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudattack_tpu import models
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.attacks.knn import KNNAttackConfig, build_knn_attack
from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
from pointcloudattack_tpu.utils.apply import make_model_fn

NUM_CLASSES = 10
ITERS = 100


def bench(n, batch):
    clouds, labels = make_synthetic_clouds(
        NUM_CLASSES, max(1, batch // NUM_CLASSES + 1), n, seed=0
    )
    data = jnp.asarray(clouds[:batch])
    target = jnp.asarray(labels[:batch])
    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=n, batch=batch
    )
    model_fn = make_model_fn(model, variables)

    for name, attack, fetch in (
        (
            "cw",
            build_cw_attack(
                model_fn,
                CWPerturbConfig(binary_step=1, num_iter=ITERS, kappa=0.0,
                                budget=0.18),
            ),
            lambda r: r.best_dist,
        ),
        (
            "knn",
            build_knn_attack(
                model_fn,
                KNNAttackConfig(num_iter=ITERS, kappa=0.0, budget=0.18),
            ),
            lambda r: r[1],
        ),
    ):
        np.asarray(fetch(attack(data, target, jax.random.PRNGKey(0))))
        t0 = time.perf_counter()
        outs = [
            attack(data, target, jax.random.PRNGKey(1 + i)) for i in range(3)
        ]
        np.asarray(fetch(outs[-1]))
        dt = (time.perf_counter() - t0) / 3
        print(
            f"N={n:>6} B={batch:>3} {name}: {dt:7.3f} s/batch "
            f"{batch/dt:8.1f} clouds/s  {batch*ITERS/dt:9.0f} iter-clouds/s"
        )


if __name__ == "__main__":
    for n, batch in ((1024, 64), (4096, 16), (10240, 8)):
        bench(n, batch)
