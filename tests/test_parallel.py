"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.parallel import mesh as pmesh
from pointcloudattack_tpu.parallel.driver import (
    run_sharded_attack,
    sharded_accuracy,
)
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.utils.apply import make_model_fn


def test_mesh_has_8_devices():
    m = pmesh.make_mesh()
    assert m.devices.size == 8


def test_shard_batch_layout():
    m = pmesh.make_mesh()
    x = jnp.zeros((16, 4, 3))
    xs = pmesh.shard_batch(m, x)
    assert xs.sharding.is_fully_addressable
    # each device holds 16/8 = 2 examples
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 4, 3)


def test_pad_to_multiple():
    arrs, n = pmesh.pad_to_multiple(
        [np.zeros((5, 3)), np.zeros((5,))], multiple=4
    )
    assert arrs[0].shape == (8, 3)
    assert n == 5


def test_sharded_attack_matches_single_device(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(binary_step=1, num_iter=30, kappa=0.0, budget=0.45)
    attack = build_cw_attack(model_fn, cfg)

    data = clouds[:8].astype(np.float32)
    target = labels[:8].astype(np.int64)
    key = jax.random.PRNGKey(5)

    res_single = attack(jnp.asarray(data), jnp.asarray(target), key)
    res_sharded = run_sharded_attack(attack, data, target, key)

    # same computation, same key -> same results regardless of sharding
    np.testing.assert_allclose(
        np.asarray(res_single.best_dist),
        res_sharded.best_dist,
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(res_single.success), res_sharded.success
    )


def test_sharded_geoa3_matches_single_device(trained_pointnet):
    """GeoA3's loss stack (fused bundle + Pallas-routed kNN + mm-bwd
    gather) must stay batch-parallel: sharding the batch over the mesh
    cannot change any per-example result."""
    from pointcloudattack_tpu.attacks.geoa3 import (
        GeoA3Config,
        build_geoa3_attack,
    )

    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = GeoA3Config(binary_max_steps=1, iter_max_steps=15)
    attack = build_geoa3_attack(model_fn, cfg)

    data = clouds[:8].astype(np.float32)
    target = labels[:8].astype(np.int64)
    key = jax.random.PRNGKey(5)

    adv_s, loss_s, succ_s = attack(jnp.asarray(data), jnp.asarray(target), key)
    adv_m, loss_m, succ_m = run_sharded_attack(attack, data, target, key)

    np.testing.assert_allclose(np.asarray(adv_s), adv_m, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loss_s), loss_m, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(succ_s), succ_m)


def test_sharded_attack_pads_odd_batch(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(binary_step=1, num_iter=10, budget=0.45)
    attack = build_cw_attack(model_fn, cfg)
    res = run_sharded_attack(
        attack, clouds[:5], labels[:5], jax.random.PRNGKey(0)
    )
    assert res.best_attack.shape[0] == 5  # sliced back from pad 8


def test_sharded_accuracy(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    acc = sharded_accuracy(model_fn, clouds, labels)
    assert acc == 1.0


def test_multihost_helpers_single_host():
    """Single-host degenerate path of the multi-host utilities."""
    from pointcloudattack_tpu.parallel import multihost as mh

    mesh = mh.global_mesh()
    assert mesh.devices.size == 8
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    gx = mh.host_local_batch_to_global(mesh, x)
    np.testing.assert_array_equal(np.asarray(gx), x)


def test_multihost_two_process_smoke():
    """Real 2-process jax.distributed run of parallel/multihost.py
    (round-5 verdict task 7): coordinator + worker subprocesses, 2
    virtual CPU devices each, assert DCN batch assembly and a
    replicated global reduction agree (details in
    tests/_multihost_worker.py)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    try:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
    except OSError as e:  # sandboxed environments without loopback bind
        pytest.skip(f"cannot bind a local port: {e}")

    worker = str(Path(__file__).parent / "_multihost_worker.py")
    env = {
        k: v for k, v in __import__("os").environ.items()
        if k != "XLA_FLAGS"
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"
        assert "MULTIHOST_OK" in out, (out, err[-2000:])
    # both processes fetched the SAME replicated global sum
    sums = {o.split("MULTIHOST_OK ")[1].split()[0] for _, o, _ in outs}
    assert len(sums) == 1, sums


def test_sharded_aof_matches_single(trained_pointnet):
    """Scan-heavy spectral family under batch sharding (VERDICT r1 #9)."""
    from pointcloudattack_tpu.attacks.aof import AOFConfig, build_aof_attack

    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = AOFConfig(
        binary_step=1, num_iter=30, low_pass=16, knn_k=10,
        kappa=0.0, budget=0.45,
    )
    attack = build_aof_attack(model_fn, cfg)
    data = clouds[:8].astype(np.float32)
    target = labels[:8].astype(np.int64)
    key = jax.random.PRNGKey(7)

    adv_s, dist_s, succ_s = attack(
        jnp.asarray(data), jnp.asarray(target), key
    )
    adv_m, dist_m, succ_m = run_sharded_attack(attack, data, target, key)
    np.testing.assert_allclose(
        np.asarray(dist_s), dist_m, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(succ_s), succ_m)


def test_sharded_si_query_matches_single(trained_pointnet):
    """while_loop-driven black-box family under batch sharding: the
    global any() stop condition must behave identically when the batch
    is spread across devices."""
    from pointcloudattack_tpu.attacks import siadv as S

    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = S.SIAdvConfig(eps=0.45, step_size=0.2, max_queries=96)
    attack = S.build_si_query_attack(model_fn, model_fn, cfg)

    data = clouds[:8].astype(np.float32)
    target = labels[:8].astype(np.int64)

    adv_s, pred_s, succ_s, q_s = attack(
        jnp.asarray(data), jnp.asarray(target)
    )
    adv_m, pred_m, succ_m, q_m = run_sharded_attack(
        lambda d, t, k: attack(d, t), data, target, jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(np.asarray(succ_s), succ_m)
    np.testing.assert_array_equal(np.asarray(q_s), q_m)
    np.testing.assert_allclose(np.asarray(adv_s), adv_m, atol=1e-5)


def test_train_step_gradient_psum_equivalence():
    """DP gradients on the 8-device mesh == single-device gradients:
    XLA's sharding-derived psum must reproduce the global batch mean.

    Compares raw gradients (and loss/batch-stats), not post-Adam params:
    Adam's first step is ~lr*sign(g), which amplifies reduction-order
    noise on near-zero gradients into full +-lr flips."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
    from pointcloudattack_tpu.train.trainer import nll_loss

    clouds, labels = make_synthetic_clouds(3, 8, 32, seed=3)
    x = jnp.asarray(clouds[:16])
    y = jnp.asarray(labels[:16].astype(np.int32))
    model = models.make_model("PointNet", 3)
    variables = models.init_model(model, jax.random.PRNGKey(0), 32, 2)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def loss_and_grads(params, bs, x, y, rng):
        def loss_fn(p):
            (out, _), state = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            return nll_loss(out, y), state["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return loss, grads, new_bs

    l1, g1, bs1 = loss_and_grads(
        variables["params"], variables["batch_stats"], x, y, rng
    )

    mesh = pmesh.make_mesh()
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    with mesh:
        l8, g8, bs8 = loss_and_grads(
            jax.device_put(variables["params"], repl),
            jax.device_put(variables["batch_stats"], repl),
            jax.device_put(x, data_sh),
            jax.device_put(y, data_sh),
            rng,
        )

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale + 5e-7)
    for a, b in zip(
        jax.tree_util.tree_leaves(bs1), jax.tree_util.tree_leaves(bs8)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_run_sharded_training_matches_single_device():
    """fit(mesh=...) sees identical batches (same host RNG) and lands on
    an equivalent model: same eval accuracy, params within cross-shard
    reduction-order tolerance (parallel/driver.run_sharded_training)."""
    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
    from pointcloudattack_tpu.parallel.driver import run_sharded_training
    from pointcloudattack_tpu.train.trainer import TrainConfig, fit

    clouds, labels = make_synthetic_clouds(3, 8, 32, seed=5)
    model = models.make_model("PointNet", 3)
    variables = models.init_model(model, jax.random.PRNGKey(0), 32, 2)
    cfg = TrainConfig(epochs=15, batch_size=8)

    single = fit(model, variables, cfg, clouds, labels, seed=3,
                 eval_data=clouds, eval_labels=labels)
    sharded = run_sharded_training(
        model, variables, cfg, clouds, labels, seed=3,
        eval_data=clouds, eval_labels=labels,
    )

    # raw params drift chaotically (Adam divides near-zero grads by
    # near-zero second moments, amplifying cross-shard reduction-order
    # noise) — the stable property is that both land on the same
    # classifier: identical predictions and accuracy on the train set
    def preds(v):
        out, _ = model.apply(v, jnp.asarray(clouds), train=False)
        return np.argmax(np.asarray(out), -1)

    p_single, p_sharded = preds(single), preds(sharded)
    np.testing.assert_array_equal(p_single, p_sharded)
    assert float(np.mean(p_single == labels)) >= 0.95


def test_fit_rejects_indivisible_batch():
    import pytest

    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
    from pointcloudattack_tpu.train.trainer import TrainConfig, fit

    clouds, labels = make_synthetic_clouds(3, 3, 32, seed=5)
    model = models.make_model("PointNet", 3)
    variables = models.init_model(model, jax.random.PRNGKey(0), 32, 2)
    with pytest.raises(ValueError, match="divisible"):
        fit(model, variables, TrainConfig(epochs=1, batch_size=9),
            clouds, labels, mesh=pmesh.make_mesh())


def test_cli_attack_sharded_matches_single_device(tmp_path, monkeypatch,
                                                  capsys):
    """cmd_attack engages the mesh when device_count > 1 and B fills it;
    results equal the single-device path bit-for-bit at B % n_dev == 0
    (no padding -> identical RNG draws)."""
    import json
    import os

    from pointcloudattack_tpu.cli.main import main

    out = str(tmp_path / "train")
    main([
        "train", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "32", "--num_classes", "3", "--epochs", "20",
        "--batch_size", "8", "--output_dir", out,
    ])
    ckpt = os.path.join(out, "PointNet_model_on_synthetic")

    def attack(outdir):
        main([
            "attack", "cw", "--dataset", "synthetic", "--model",
            "PointNet", "--num_points", "32", "--num_classes", "3",
            "--checkpoint", ckpt, "--output_dir", outdir,
            "--binary_step", "1", "--num_iter", "20", "--kappa", "0",
            "--budget", "0.45", "--num_samples", "8", "--save_adv",
        ])
        return json.load(
            open(os.path.join(outdir, "attack_cw_summary.json"))
        )

    sharded = attack(str(tmp_path / "sharded"))
    assert "sharding batch over 8 devices" in capsys.readouterr().out

    monkeypatch.setattr(jax, "device_count", lambda *a: 1)
    single = attack(str(tmp_path / "single"))
    assert "sharding batch over" not in capsys.readouterr().out

    assert sharded["asr"] == single["asr"]
    assert abs(sharded["mse"] - single["mse"]) < 1e-9

    a = np.loadtxt(
        sorted((tmp_path / "sharded" / "AdvData" / "PointNet").iterdir())[0]
    )
    b = np.loadtxt(
        sorted((tmp_path / "single" / "AdvData" / "PointNet").iterdir())[0]
    )
    # partitioned matmuls can flip the last float ulp -> one %.6f digit
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_shard_map_path_semantic_parity(trained_pointnet):
    """The multi-device-TPU path (shard_map + per-shard key fold-in),
    forced on the CPU mesh: same success flags as single-device, and
    best distances within init-noise jitter (the 1e-7-scale per-round
    noise is the only divergence source)."""
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(binary_step=1, num_iter=30, kappa=0.0, budget=0.45)
    attack = build_cw_attack(model_fn, cfg)

    data = clouds[:8].astype(np.float32)
    target = labels[:8].astype(np.int64)
    key = jax.random.PRNGKey(5)

    res_single = attack(jnp.asarray(data), jnp.asarray(target), key)
    res_sm = run_sharded_attack(
        attack, data, target, key, use_shard_map=True
    )
    np.testing.assert_array_equal(
        np.asarray(res_single.success), res_sm.success
    )
    np.testing.assert_allclose(
        np.asarray(res_single.best_dist), res_sm.best_dist,
        rtol=5e-2, atol=1e-3,
    )


def test_manual_scope_gates_mosaic_dispatch(monkeypatch):
    """use_mosaic_kernels: off in a multi-device process outside
    shard_map (GSPMD would raise on Mosaic custom calls), on inside
    manual_sharding_scope."""
    from pointcloudattack_tpu.ops import backend

    monkeypatch.setattr(backend, "is_tpu_backend", lambda: True)
    assert jax.device_count() > 1  # the 8-device CPU test mesh
    assert not backend.use_mosaic_kernels()
    with backend.manual_sharding_scope():
        assert backend.use_mosaic_kernels()
    assert not backend.use_mosaic_kernels()
