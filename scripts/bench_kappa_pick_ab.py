"""A/B of the kappa forward pick-loop variants on real hardware
(round-5 verdict task 4).

v1: k+1 x {min, where(col), min, mask} INDEX-extraction loop (~6
dependent VPU passes per pick).  v2: value-extraction loop (3 passes
per pick) + threshold/cumsum-rank boundary reconstruction — the
backward's 4-scalar selection rebuild applied to the forward
(ops/pallas/kappa_kernel.py::_kappa_fwd_kernel_v2).  Outputs are
bitwise identical (tests/test_pallas_kappa.py::test_pick_v1_v2_bitwise)
so this is timing-only.

Two measurements per variant, each in its own subprocess (PCA_KAPPA_PICK
pins the variant for code that doesn't thread the static arg):

  kernel_us   — the forward kernel alone, fori_loop of dependent calls
                at the GeoA3 hot shape ([8, 1024] k=16, kappa output fed
                back so nothing folds away)
  geoa3       — the full bench.py geoa3 family (10 x 500 reference
                schedule), clouds/s

Usage: python scripts/bench_kappa_pick_ab.py [--inner v1|v2]
(no flag = orchestrate both and print the comparison JSON).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_inner(pick: str) -> None:
    os.environ["PCA_KAPPA_PICK"] = pick
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcloudattack_tpu.ops.pallas.kappa_kernel import _kappa_fwd

    b, n, k, iters = 8, 1024, 16, 200
    key = jax.random.PRNGKey(0)
    adv = jax.random.normal(key, (b, n, 3), jnp.float32)
    nrm = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3), jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

    @jax.jit
    def loop(a):
        def body(_, a):
            kap, *_rest = _kappa_fwd(a, nrm, k, pick=pick)
            return a + 1e-6 * kap[..., None]

        return jax.lax.fori_loop(0, iters, body, a)

    np.asarray(loop(adv))  # compile + server first-execute
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(adv))
        times.append(time.perf_counter() - t0)
    kernel_us = min(times) / iters * 1e6

    import bench

    fam = bench.bench_geoa3()
    print("INNER_JSON " + json.dumps(
        {"pick": pick, "kernel_us": round(kernel_us, 2), "geoa3": fam}
    ))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", default="")
    args = ap.parse_args()
    if args.inner:
        run_inner(args.inner)
        return

    out = {}
    for pick in ("v1", "v2"):
        env = dict(os.environ, PCA_KAPPA_PICK=pick)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", pick],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("INNER_JSON ")]
        if r.returncode != 0 or not line:
            out[pick] = {"error": (r.stderr or r.stdout)[-2000:]}
            continue
        out[pick] = json.loads(line[0][len("INNER_JSON "):])
    if "error" not in out.get("v1", {}) and "error" not in out.get("v2", {}):
        out["kernel_speedup"] = round(
            out["v1"]["kernel_us"] / out["v2"]["kernel_us"], 3
        )
        out["geoa3_speedup"] = round(
            out["v2"]["geoa3"]["clouds_per_sec"]
            / out["v1"]["geoa3"]["clouds_per_sec"], 3
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
