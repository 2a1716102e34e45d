"""Model-forward throughput table for BENCH.md (run on the TPU).

Methodology: jax.block_until_ready does not block on the axon tunnel;
each entry enqueues 10 varying-input forwards and fences with one host
fetch of the last output (device programs execute in order).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudattack_tpu import models

B, N = 32, 1024
rng = np.random.RandomState(0)


def bench(name, **kw):
    model = models.make_model(name, 40, **kw)
    variables = models.init_model(model, jax.random.PRNGKey(0), N, 2)
    fwd = jax.jit(lambda a: model.apply(variables, a, train=False)[0])
    xs = [
        jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        for _ in range(10)
    ]
    np.asarray(fwd(xs[0]))
    t0 = time.perf_counter()
    outs = [fwd(x) for x in xs]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / 10
    print(f"{name}: {dt*1000:.1f} ms/forward  {B/dt:.0f} clouds/s")


if __name__ == "__main__":
    bench("PointNet")
    bench("PointNet++Ssg")
    bench("PointNet++Msg")
    bench("DGCNN")
    bench("CurveNet")
