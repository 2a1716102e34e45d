"""Headline benchmark: adversarial clouds/sec/chip for 200-step CW on
PointNet (1024 points), the BASELINE.json north-star config — plus MFU
and per-family throughput entries (CW / AOF / SIadv-iFGM).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "mfu": ..., "families": {...}}

``vs_baseline`` is measured throughput / 1.0 (the BASELINE.json target of
>= 1 adv cloud/sec/chip for the same config — the reference publishes no
numbers of its own, see BASELINE.md).

Timing methodology: on the axon TPU tunnel ``jax.block_until_ready`` does
NOT actually block, so every measurement enqueues ``reps`` runs with
distinct keys and then fetches a small leaf of the LAST result to the
host — device programs execute in order, so the fetch fences the whole
batch (one ~25 ms fetch amortized over reps).
"""

import json
import os
import sys
import time

# pin the platform BEFORE the persistent cache decides (it skips itself
# on pinned-CPU runs — XLA:CPU AOT entries are not host-portable)
if os.environ.get("PCA_BENCH_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["PCA_BENCH_PLATFORM"])

from pointcloudattack_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _wait_for_backend(max_wait: float = 1500.0, sleep: float = 60.0):
    """Retry backend init: the axon TPU tunnel is occasionally contended
    and the first ``jax.devices()`` raises UNAVAILABLE for minutes at a
    time.  jax caches the failure, so each retry clears backend state
    first."""
    t0 = time.time()
    while True:
        try:
            return jax.devices()
        except RuntimeError as e:
            if time.time() - t0 > max_wait:
                raise
            print(
                f"backend unavailable ({str(e).splitlines()[0][:80]}); "
                f"retrying in {sleep:.0f}s",
                file=sys.stderr,
            )
            time.sleep(sleep)
            try:
                jax.extend.backend.clear_backends()
            except Exception:
                pass

from pointcloudattack_tpu import models
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
from pointcloudattack_tpu.utils.apply import make_model_fn

NUM_CLASSES = 40
NUM_POINTS = 1024
BATCH = 64  # throughput peak on v5e (see batch sweep: 64 > 32/128/256)
NUM_ITER = 200
BINARY_STEPS = 1  # 200 optimization steps total, per the baseline config

# PCA_BENCH_SMOKE=1: tiny shapes/iters — a CPU-runnable "does every
# family still build and run end-to-end" screen for THIS harness (the
# real numbers need the TPU; a bench.py bug must not surface for the
# first time at the end-of-round driver run).  Combine with
# PCA_BENCH_PLATFORM=cpu so a down axon tunnel can't stall the screen.
_SMOKE = os.environ.get("PCA_BENCH_SMOKE", "0") == "1"
if _SMOKE:
    NUM_POINTS, BATCH, NUM_ITER = 128, 4, 3

# v5e bf16 MXU peak; f32/HIGHEST matmuls run as multi-pass emulation, so
# MFU computed against this peak is conservative
PEAK_FLOPS = 197e12


def _time_enqueued(run, fetch, reps=3, per_rep=False):
    """Seconds/run: enqueue reps runs, fence with one host fetch.

    per_rep=True fences EVERY rep (one ~25 ms fetch each) and returns
    ``(mean, min)`` — for slow families (seconds per batch) where the
    fetch overhead is negligible but run-to-run tunnel noise is not
    (round-3 verdict: with aggregate-only timing "nobody can tell
    regression from noise").  Default returns ``(mean, None)``: fast
    families keep the single-fence pipeline, where a per-rep fetch
    would serialize the queue and bias the number.
    """
    np.asarray(fetch(run(0)))  # compile + warm
    if per_rep:
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            np.asarray(fetch(run(1 + i)))
            times.append(time.perf_counter() - t0)
        return sum(times) / reps, min(times)
    t0 = time.perf_counter()
    outs = [run(1 + i) for i in range(reps)]
    np.asarray(fetch(outs[-1]))
    return (time.perf_counter() - t0) / reps, None


_FLOPS_CACHE: dict = {}


def _flops_unfused(fn, *args):
    """Total FLOPs of ``fn(*args)`` from its UNFUSED lowering on the
    XLA:CPU backend.

    cost_analysis cannot see inside ``tpu_custom_call``, so any program
    dispatching Pallas kernels under-reports FLOPs (round 3: headline
    MFU read 0.0016 at HIGHER throughput than round 2's 0.24).  Forcing
    the fused-kernel flags off and lowering the SAME trace for CPU
    yields a program where every matmul is an explicit XLA HLO — the
    semantic FLOP count of the computation, independent of which
    backend or kernel path actually ran.  The chain/gather tiers gate
    on the FUSED_MAXPOOL flags; the kNN/FPS/chamfer kernels gate on
    ops.backend.use_mosaic_kernels(), which consults the PROCESS
    backend (still TPU here) — force_xla_paths() turns those off for
    the duration of the trace (without it every kNN-bearing family —
    geoa3, knn, dgcnn, ssg, curvenet — nulled out with "Only interpret
    mode is supported on CPU backend").
    """
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL
    from pointcloudattack_tpu.ops.backend import force_xla_paths

    prior = dict(FUSED_MAXPOOL)
    FUSED_MAXPOOL["enabled"] = False
    FUSED_MAXPOOL["gather"] = False
    FUSED_MAXPOOL["ballq"] = False
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu), force_xla_paths():
            ca = (
                jax.jit(lambda *a: fn(*a))
                .lower(*args)
                .compile()
                .cost_analysis()
            )
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"])
    finally:
        FUSED_MAXPOOL.update(prior)


def _mfu(jitted, dt, *args, iters=1, key=None):
    """Model FLOP utilization of one call taking ``dt`` seconds.

    FLOPs come from :func:`_flops_unfused` (Pallas-blind cost_analysis
    fixed in round 4).  XLA's cost_analysis counts a ``lax.scan`` body
    ONCE regardless of trip count, so the caller passes the loop count
    explicitly (for the attack jits: binary_step * num_iter) — without
    it the CW MFU reads ~0.001 instead of the measured 0.24 (BENCH.md
    roofline section).  Approximate: one-time out-of-scan work (e.g.
    AOF's spectral basis) is also multiplied, so loop-light families
    read slightly high.  ``key`` caches the CPU lowering per family.
    """
    try:
        if key is not None and key in _FLOPS_CACHE:
            flops = _FLOPS_CACHE[key]
        else:
            flops = _flops_unfused(jitted, *args)
            if key is not None:
                _FLOPS_CACHE[key] = flops
        return round(flops * iters / dt / PEAK_FLOPS, 4)
    except Exception:
        return None


def bench_cw(compute_dtype=None):
    """Headline CW config; compute_dtype=jnp.bfloat16 for the bf16 path."""
    clouds, labels = make_synthetic_clouds(
        NUM_CLASSES, max(1, BATCH // NUM_CLASSES + 1), NUM_POINTS, seed=0
    )
    data = jnp.asarray(clouds[:BATCH])
    target = jnp.asarray(labels[:BATCH])

    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=BATCH
    )
    model_fn = make_model_fn(model, variables, compute_dtype=compute_dtype)

    cfg = CWPerturbConfig(
        binary_step=BINARY_STEPS, num_iter=NUM_ITER, kappa=30.0, budget=0.18
    )
    attack = build_cw_attack(model_fn, cfg)

    dt, _ = _time_enqueued(
        lambda i: attack(data, target, jax.random.PRNGKey(1 + i)),
        lambda res: res.best_dist,
    )
    return {
        "clouds_per_sec": round(BATCH / dt, 3),
        "sec_per_batch": round(dt, 4),
        "mfu": _mfu(
            attack, dt, data, target, jax.random.PRNGKey(0),
            iters=BINARY_STEPS * NUM_ITER,
            key=("cw", compute_dtype is not None),
        ),
    }


def _bench_cw_victim(
    model_key, seed, gather=None, chain=None, reps=3, b=16
):
    """CW on a grouped-op victim, 100 iters.

    ``gather``/``chain``: None measures the SHIPPED per-family policy
    (models.common.FUSED_POLICY); True/False force that tier for an
    explicit A/B arm (full A/B matrix: scripts/bench_fused_maxpool.py).
    """
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL

    b, iters = (4, 3) if _SMOKE else (b, 100)
    clouds, labels = make_synthetic_clouds(8, max(1, b // 8), NUM_POINTS, seed=seed)
    data = jnp.asarray(clouds[:b])
    target = jnp.asarray(labels[:b])
    model = models.make_model(model_key, NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=2
    )
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(
        binary_step=1, num_iter=iters, kappa=30.0, budget=0.18
    )
    attack = build_cw_attack(model_fn, cfg)
    prior = dict(FUSED_MAXPOOL)
    if gather is not None:
        FUSED_MAXPOOL["gather"] = bool(gather)
    if chain is not None:
        FUSED_MAXPOOL["enabled"] = bool(chain)
    try:
        dt, dt_min = _time_enqueued(
            lambda i: attack(data, target, jax.random.PRNGKey(1 + i)),
            lambda res: res.best_dist,
            reps=reps,
            per_rep=True,  # seconds/batch: fence each rep, report min
        )
        mfu = _mfu(
            attack, dt, data, target, jax.random.PRNGKey(0), iters=iters,
            key=("cw_victim", model_key, b),
        )
    finally:
        FUSED_MAXPOOL.update(prior)
    return {
        "clouds_per_sec": round(b / dt, 3),
        "clouds_per_sec_best": round(b / dt_min, 3),
        "sec_per_batch": round(dt, 4),
        "mfu": mfu,
    }


def bench_cw_dgcnn(gather=None, chain=None):
    """CW on the heaviest gradient victim (DGCNN, Pallas kNN + bit-exact
    tri gather via custom_vjp).  Default = shipped policy (round-4:
    fused chain OFF — the measured 2x regression of round 3)."""
    return _bench_cw_victim("DGCNN", seed=3, gather=gather, chain=chain)


def bench_cw_ssg(gather=None, chain=None, b=16):
    """CW on PointNet++ SSG (FPS + ball query + grouped set-abstraction
    MLPs).  Default = shipped policy (round-4: chain + gather ON).
    The iteration is ball-query-bound (BENCH.md SSG anatomy); b=32 is
    the measured batch-amortization peak (+22%)."""
    return _bench_cw_victim(
        "PointNet++Ssg", seed=6, gather=gather, chain=chain, b=b
    )


def bench_cw_msg(b=16):
    """CW on PointNet++ MSG (3-radius multi-scale grouping; the widest
    SA towers in the zoo).  Default = shipped policy (round-4 A/B:
    chain+gather ON, +27%).  Previously only measured by the A/B script
    — round-5 verdict task: track it in the driver JSON."""
    return _bench_cw_victim("PointNet++Msg", seed=12, b=b)


def bench_iso_lockstep():
    """Device-resident batched-Thompson TSI (the --iso_lockstep CLI
    path, measured 17-18x over the host-sequential reference twin in
    round 3).  The whole bandit is ONE lax.while_loop dispatch; the
    returned arrays are host-synced inside, so plain wall-clock timing
    is already fenced.  No MFU: the loop is probe-bound and its trip
    count is data-dependent (early exit on all-success)."""
    from pointcloudattack_tpu.attacks import iso as I

    b = 4 if _SMOKE else 32
    num_init = 3 if _SMOKE else 50
    clouds, labels = make_synthetic_clouds(8, max(1, b // 8), NUM_POINTS, seed=13)
    data = jnp.asarray(clouds[:b])
    labs = jnp.asarray(labels[:b])
    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=b
    )
    model_fn = make_model_fn(model, variables)

    def run_once(i):
        bandit = I.BernThompson(d=4, a0=-np.pi, b0=np.pi, seed=17 + i)
        return I.thompson_sample_attack_lockstep(
            bandit, data, labs, num_init=num_init, model_fn=model_fn,
            key=jax.random.PRNGKey(21 + i),
        )

    run_once(0)  # compile + warm
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run_once(1 + i)  # host-synced return = fenced
        times.append(time.perf_counter() - t0)
    dt = sum(times) / len(times)
    return {
        "clouds_per_sec": round(b / dt, 3),
        "clouds_per_sec_best": round(b / min(times), 3),
        "sec_per_batch": round(dt, 4),
        "mfu": None,
    }


def bench_si_query():
    """Shape-invariant sensitivity-ranked query attack (reference
    SIadv_attack.py:503-624) — the query-family representative in the
    driver JSON (round-5 verdict task).  One jit: tangent-frame build +
    surrogate grad rank + N-probe query loop."""
    from pointcloudattack_tpu.attacks.siadv import (
        SIAdvConfig,
        build_si_query_attack,
    )

    b = 4 if _SMOKE else 32
    clouds, labels = make_synthetic_clouds(8, max(1, b // 8), NUM_POINTS, seed=14)
    data = jnp.asarray(clouds[:b])
    target = jnp.asarray(labels[:b])
    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=b
    )
    model_fn = make_model_fn(model, variables)
    cfg = SIAdvConfig(eps=0.18, step_size=0.32)
    attack = build_si_query_attack(model_fn, model_fn, cfg)
    dt, dt_min = _time_enqueued(
        lambda i: attack(data + 0e0 * i, target),
        lambda out: out[3],
        reps=3,
        per_rep=True,
    )
    return {
        "clouds_per_sec": round(b / dt, 3),
        "clouds_per_sec_best": round(b / dt_min, 3),
        "sec_per_batch": round(dt, 4),
        # no MFU: the probe loop is an early-exit lax.while_loop
        # (siadv.py:247) whose executed trip count is DATA-DEPENDENT —
        # multiplying the scan-body count by the NUM_POINTS upper bound
        # read 16x peak in the round-5 driver run.  Same convention as
        # iso_lockstep (query-limited families report throughput only).
        "mfu": None,
    }


def bench_cw_curvenet():
    """CW on CurveNet (the compile- and gather-heaviest victim).
    Default = shipped policy (round-4: fully UNFUSED — careful 3-arm
    A/B measured XLA 3.52 clouds/s over chain 2.74 and chain+gather
    3.35; BENCH.md cw_curvenet reconciliation).  B=8 matches the A/B
    config in scripts/bench_fused_maxpool.py."""
    return _bench_cw_victim("CurveNet", seed=9, b=8)


def bench_aof():
    from pointcloudattack_tpu.attacks.aof import AOFConfig, build_aof_attack

    b = 4 if _SMOKE else 8
    clouds, labels = make_synthetic_clouds(8, 1, NUM_POINTS, seed=1)
    data = jnp.asarray(clouds[:b])
    target = jnp.asarray(labels[:b])
    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=b
    )
    model_fn = make_model_fn(model, variables)
    cfg = AOFConfig(
        binary_step=2, num_iter=3 if _SMOKE else 100, kappa=0.0,
        budget=0.45, low_pass=16 if _SMOKE else 100,
    )
    attack = build_aof_attack(model_fn, cfg)
    dt, _ = _time_enqueued(
        lambda i: attack(data, target, jax.random.PRNGKey(1 + i)),
        lambda out: out[1],
    )
    return {
        "clouds_per_sec": round(b / dt, 3),
        "sec_per_batch": round(dt, 4),
        "mfu": _mfu(
            attack, dt, data, target, jax.random.PRNGKey(0),
            iters=cfg.binary_step * cfg.num_iter, key=("aof",),
        ),
    }


def bench_knn(iters: int = 2500, nn_refresh: int = 1):
    """KNN attack (reference KNN_attack.py library default 2500 iters),
    B=64 like the CW headline.  nn_refresh=5 is the cached
    nearest-point fast path (ASR parity pinned in
    tests/test_attack_families.py)."""
    from pointcloudattack_tpu.attacks.knn import (
        KNNAttackConfig,
        build_knn_attack,
    )

    clouds, labels = make_synthetic_clouds(
        NUM_CLASSES, max(1, BATCH // NUM_CLASSES + 1), NUM_POINTS, seed=4
    )
    data = jnp.asarray(clouds[:BATCH])
    target = jnp.asarray(labels[:BATCH])
    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=BATCH
    )
    model_fn = make_model_fn(model, variables)
    cfg = KNNAttackConfig(
        num_iter=3 if _SMOKE else iters, kappa=30.0, budget=0.18,
        nn_refresh=nn_refresh,
    )
    attack = build_knn_attack(model_fn, cfg)
    dt, dt_min = _time_enqueued(
        lambda i: attack(data, target, jax.random.PRNGKey(1 + i)),
        lambda out: out[1],
        reps=3,
        per_rep=True,  # ~7 s/batch: reps floor + min (verdict task 9)
    )
    return {
        "clouds_per_sec": round(BATCH / dt, 3),
        "clouds_per_sec_best": round(BATCH / dt_min, 3),
        "sec_per_batch": round(dt, 4),
        "mfu": _mfu(
            attack, dt, data, target, jax.random.PRNGKey(0), iters=iters,
            key=("knn",),
        ),
    }


def bench_geoa3(b: int = 8):
    """GeoA3 (the reference repo's flagship attack) at its reference
    default schedule (10 binary rounds x 500 iters).  B=8 is the
    reference Eval_GeoA3.py batch; the b=32 arm amortizes the per-iter
    dispatch/serialization overhead of the latency-bound loop over 4x
    clouds (binary search + losses are per-example, so batch size is
    throughput-only, not semantics).  The round-3 curv_knn_refresh arm
    measured NEGATIVE (cache 1.5x slower than recomputing) and was
    removed — see BENCH.md "measured negative results"."""
    from pointcloudattack_tpu.attacks.geoa3 import (
        GeoA3Config,
        build_geoa3_attack,
    )

    clouds, labels = make_synthetic_clouds(max(b, 8), 1, NUM_POINTS, seed=5)
    data = jnp.asarray(clouds[:b])
    target = jnp.asarray(labels[:b])
    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=b
    )
    model_fn = make_model_fn(model, variables)
    cfg = GeoA3Config(
        binary_max_steps=2 if _SMOKE else 10,
        iter_max_steps=3 if _SMOKE else 500,
    )
    attack = build_geoa3_attack(model_fn, cfg)
    dt, dt_min = _time_enqueued(
        lambda i: attack(data, target, jax.random.PRNGKey(1 + i)),
        lambda out: out[1],
        reps=3,
        per_rep=True,  # ~9 s/batch: reps floor + min (verdict task 9)
    )
    return {
        "clouds_per_sec": round(b / dt, 3),
        "clouds_per_sec_best": round(b / dt_min, 3),
        "sec_per_batch": round(dt, 4),
        "mfu": _mfu(
            attack, dt, data, target, jax.random.PRNGKey(0),
            iters=cfg.binary_max_steps * cfg.iter_max_steps,
            key=("geoa3", b),
        ),
    }


def bench_si_ifgm(normal_refresh: int = 1):
    """refresh=1 is the reference's per-step frame rebuild; refresh=5 is
    the measured 2.5x fast path (BENCH.md round 3)."""
    from pointcloudattack_tpu.attacks.siadv import (
        SIAdvConfig,
        build_si_ifgm,
    )

    b = BATCH if _SMOKE else 64
    clouds, labels = make_synthetic_clouds(8, max(1, b // 8), NUM_POINTS, seed=2)
    data = jnp.asarray(clouds[:b])
    target = jnp.asarray(labels[:b])
    model = models.make_model("PointNet", NUM_CLASSES)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=NUM_POINTS, batch=b
    )
    model_fn = make_model_fn(model, variables)
    cfg = SIAdvConfig(eps=0.18, step_size=0.007,
                      max_steps=3 if _SMOKE else 50,
                      normal_refresh=normal_refresh)
    attack = build_si_ifgm(model_fn, model_fn, cfg)
    dt, _ = _time_enqueued(
        lambda i: attack(data + 0e0 * i, target), lambda out: out[1]
    )
    return {
        "clouds_per_sec": round(b / dt, 3),
        "sec_per_batch": round(dt, 4),
        "mfu": _mfu(
            attack, dt, data, target, iters=cfg.max_steps,
            key=("si_ifgm",),
        ),
    }


def _run_family(fn):
    """Run one family with Mosaic-rejection insurance (shared helper:
    a Mosaic/Pallas failure disables the fused chain+pool kernels for
    the REST of the process and retries once on the XLA path; unrelated
    errors re-raise).  Each family's result records the fused-kernel
    state it was actually measured under — a tail family tripping the
    disable must not mislabel the already-measured headline."""
    from pointcloudattack_tpu.models.common import (
        FUSED_MAXPOOL,
        retry_without_fused_maxpool,
    )

    from pointcloudattack_tpu.models.common import fused_state

    was_off = FUSED_MAXPOOL["enabled"] is False
    out = retry_without_fused_maxpool(fn)
    out["fused"] = fused_state()
    if not was_off and FUSED_MAXPOOL["enabled"] is False:
        out["fused_maxpool_disabled_after"] = FUSED_MAXPOOL[
            "disabled_reason"
        ]
    return out


# Stop starting new families once this much wall time has elapsed: on
# the axon tunnel every distinct executable pays ~60-130 s of server
# first-execution, and a lost headline (driver timeout) costs more than
# a skipped tail family.  PCA_BENCH_BUDGET_S overrides (0 = unlimited).
_FAMILY_BUDGET_S = float(os.environ.get("PCA_BENCH_BUDGET_S", "3000") or 0)


def main():
    _wait_for_backend()
    t0 = time.time()
    cw = _run_family(bench_cw)
    families = {"cw": cw}
    # base families measure the SHIPPED per-victim policy
    # (models.common.FUSED_POLICY); *_gather/*_fused arms FORCE a tier
    # for an in-driver A/B (full matrix: scripts/bench_fused_maxpool.py)
    for name, fn in (
        ("cw_bf16", lambda: bench_cw(jnp.bfloat16)),
        ("cw_dgcnn", bench_cw_dgcnn),
        ("cw_dgcnn_gather",
         lambda: bench_cw_dgcnn(gather=True, chain=True)),
        ("cw_ssg", bench_cw_ssg),
        ("cw_ssg_nofuse",
         lambda: bench_cw_ssg(gather=False, chain=False)),
        # batch-amortization arm: +22% over B=16 (BENCH.md SSG anatomy;
        # B=64 measured 19.7 — worse, so 32 is the throughput point)
        ("cw_ssg_b32", lambda: bench_cw_ssg(b=32)),
        ("cw_msg", bench_cw_msg),
        ("knn", bench_knn),
        ("knn_r5", lambda: bench_knn(nn_refresh=5)),
        ("geoa3", bench_geoa3),
        ("geoa3_b32", lambda: bench_geoa3(b=32)),
        ("aof", bench_aof),
        ("si_ifgm", bench_si_ifgm),
        ("si_ifgm_r5", lambda: bench_si_ifgm(normal_refresh=5)),
        ("iso_lockstep", bench_iso_lockstep),
        ("si_query", bench_si_query),
        # compile-heaviest victim LAST: if the budget trips, the
        # verdict-tracked families above still get measured
        ("cw_curvenet", bench_cw_curvenet),
    ):
        if _FAMILY_BUDGET_S and time.time() - t0 > _FAMILY_BUDGET_S:
            families[name] = {"skipped": "time_budget"}
            continue
        try:
            if name.endswith(("_gather", "_nofuse")):
                # forced A/B arm: a Mosaic rejection here must NOT
                # disable the fused kernels for the remaining families
                # — record the error and move on
                families[name] = fn()
            else:
                families[name] = _run_family(fn)
        except Exception as e:  # keep the headline alive on any breakage
            families[name] = {"error": str(e)[:200]}

    import subprocess

    from pointcloudattack_tpu.models.common import FUSED_POLICY

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True,
        ).stdout.strip()
    except Exception:
        sha = ""
    print(
        json.dumps(
            {
                "metric": (
                    "adv_clouds_per_sec_per_chip_cw200_pointnet_1024"
                ),
                "value": cw["clouds_per_sec"],
                "unit": "clouds/s",
                "vs_baseline": round(cw["clouds_per_sec"] / 1.0, 3),
                "mfu": cw["mfu"],
                # FLOPs from the unfused XLA:CPU lowering (Pallas-blind
                # cost_analysis fixed in round 4); scan bodies counted
                # once then multiplied by the loop count, so one-time
                # out-of-scan work is overcounted — mfu is an UPPER
                # bound, loosest for loop-light families (aof, si_ifgm)
                "mfu_method": "unfused_cpu_lowering_flops_x_iters",
                # the HEADLINE's provenance: the fused-kernel state cw
                # was measured under (a later family may flip the
                # process-wide flag; per-family state is in families.*)
                "fused": cw["fused"],
                "fused_policy": FUSED_POLICY,
                "commit": sha,
                "families": families,
            }
        )
    )


if __name__ == "__main__":
    main()
