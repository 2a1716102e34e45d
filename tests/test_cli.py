"""End-to-end CLI tests on the synthetic dataset (train -> test -> attack)."""

import json
import os

import numpy as np
import pytest

from pointcloudattack_tpu.cli.main import main


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    main([
        "train", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3", "--epochs", "25",
        "--batch_size", "12", "--output_dir", out,
    ])
    ckpt = os.path.join(out, "PointNet_model_on_synthetic")
    assert os.path.exists(ckpt)
    return out, ckpt


def test_train_and_test(trained_run):
    out, ckpt = trained_run
    acc = main([
        "test", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
    ])
    assert acc == 1.0


def test_attack_cw_cli(trained_run):
    out, ckpt = trained_run
    asr = main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "2", "--num_iter", "50", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "6", "--save_adv",
    ])
    assert asr >= 0.8
    summary = json.load(
        open(os.path.join(out, "attack_cw_summary.json"))
    )
    assert summary["family"] == "cw"
    adv_dir = os.path.join(out, "AdvData", "PointNet")
    files = [f for f in os.listdir(adv_dir) if f.startswith("cw_")]
    assert len(files) == 6
    cloud = np.loadtxt(os.path.join(adv_dir, files[0]))
    assert cloud.shape == (64, 3)


def test_attack_geoa3_loss_knobs_cli(trained_run):
    """GeoA3 with the reference Eval_GeoA3 loss flags: Margin cls loss,
    single-side CD, Hausdorff off, offset projection + Linf cap."""
    out, ckpt = trained_run
    asr = main([
        "attack", "geoa3", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "2", "--num_iter", "60",
        "--cls_loss_type", "Margin", "--confidence", "1.0",
        "--dis_loss_type", "CD", "--is_cd_single_side", "1",
        "--hd_loss_weight", "0", "--curv_loss_weight", "0.5",
        "--use_offset_proj", "1", "--cc_linf", "0.5",
        "--num_samples", "4", "--save_adv",
    ])
    assert 0.0 <= asr <= 1.0
    # cc_linf semantics: per-point displacement of each geoa3 dump stays
    # within the cap (compare against the same synthetic test clouds the
    # CLI attacked: first 4 of make_synthetic_clouds(3, 16, 64, seed=0))
    from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds

    clouds, _ = make_synthetic_clouds(3, 16, 64, seed=0)
    adv_dir = os.path.join(out, "AdvData", "PointNet")
    files = sorted(f for f in os.listdir(adv_dir) if f.startswith("geoa3_"))
    assert len(files) == 4
    for f in files:
        i = int(f.split("_")[1])
        cloud = np.loadtxt(os.path.join(adv_dir, f))
        assert cloud.shape == (64, 3)
        disp = np.linalg.norm(cloud - clouds[i], axis=-1)
        assert disp.max() <= 0.5 + 1e-5, f


def test_attack_add_clusters_cli(trained_run):
    """Cluster-adding attack with the reference cluster-shape knobs."""
    out, ckpt = trained_run
    asr = main([
        "attack", "add-clusters", "--dataset", "synthetic",
        "--model", "PointNet", "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "2", "--num_iter", "40", "--kappa", "0",
        "--cl_num_add", "2", "--cl_num_p", "8",
        "--init_weight", "0.5", "--max_weight", "10",
        "--num_samples", "3",
    ])
    assert 0.0 <= asr <= 1.0


def test_attack_siadv_surrogate_cli(trained_run):
    """Surrogate/target split: gradients from a separate white-box model
    (reference Eval_SIadv.py:180-182 surrogate -> target)."""
    out, ckpt = trained_run
    asr = main([
        "attack", "si-query", "--dataset", "synthetic",
        "--model", "PointNet", "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--surrogate_model", "PointNet", "--surrogate_checkpoint", ckpt,
        "--step_size", "0.4", "--budget", "0.45", "--num_samples", "4",
    ])
    assert 0.0 <= asr <= 1.0


def test_attack_taof_cli(trained_run):
    """Targeted TAOF through the CLI: exercises the y_truth wiring (the
    success rule needs true labels, reference TAOF_attack.py:205-211)."""
    out, ckpt = trained_run
    main([
        "attack", "taof", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--attack_method", "target", "--binary_step", "2",
        "--num_iter", "40", "--kappa", "0", "--budget", "0.45",
        "--low_pass", "24", "--num_samples", "4",
    ])
    bundle = np.load(os.path.join(out, "taof_results.npz"))
    assert bundle["test_pc"].shape == (4, 64, 3)
    # target labels rotate truth+1, true labels preserved in the bundle
    assert (bundle["target_label"] != bundle["test_label"]).all()


def test_attack_cw_bf16_cli(trained_run):
    """--compute_dtype bf16 runs the victim forward in bfloat16."""
    out, ckpt = trained_run
    asr = main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "2", "--num_iter", "50", "--kappa", "3",
        "--budget", "0.45", "--num_samples", "6",
        "--compute_dtype", "bf16",
    ])
    assert asr >= 0.8


def test_test_advdata_cli(trained_run, capsys):
    out, ckpt = trained_run
    adv_dir = os.path.join(out, "AdvData", "PointNet")
    main([
        "test-advdata", "--model", "PointNet", "--num_points", "64",
        "--num_classes", "3", "--checkpoint", ckpt,
        "--adv_dir", adv_dir, "--output_dir", out,
    ])
    captured = capsys.readouterr().out
    assert "recovered to true label" in captured


def test_attack_with_transfer_and_shuffle(trained_run):
    out, ckpt = trained_run
    asr = main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--trans_model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--trans_checkpoint", ckpt,
        "--output_dir", out,
        "--binary_step", "1", "--num_iter", "30", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "4", "--transfer_test",
    ])
    summary = json.load(open(os.path.join(out, "attack_cw_summary.json")))
    assert "shuffle_asr" in summary
    assert "transfer_asr" in summary


def test_attack_transfer_panel(trained_run):
    """Comma-separated --trans_model runs a multi-model transfer panel
    (the reference KNN/GeoA3 attacks self-test against up to 5 models)."""
    out, ckpt = trained_run
    main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--trans_model", "PointNet,DGCNN",
        "--trans_checkpoint", f"{ckpt},",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "1", "--num_iter", "30", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "3", "--transfer_test",
    ])
    summary = json.load(open(os.path.join(out, "attack_cw_summary.json")))
    mat = summary["transfer_asr"]
    assert set(mat) == {"PointNet", "DGCNN"}
    for v in mat.values():
        assert 0.0 <= v <= 1.0


def test_attack_transfer_panel_duplicate_arch(trained_run):
    """Two checkpoints of the same architecture both appear (suffix keys),
    and positional name<->checkpoint pairing survives empty slots."""
    out, ckpt = trained_run
    main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--trans_model", "PointNet,PointNet",
        "--trans_checkpoint", f"{ckpt},",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "1", "--num_iter", "30", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "3", "--transfer_test",
    ])
    summary = json.load(open(os.path.join(out, "attack_cw_summary.json")))
    mat = summary["transfer_asr"]
    # trained checkpoint + random-weight second instance, both present
    assert set(mat) == {"PointNet", "PointNet#2"}


def test_attack_transfer_panel_extra_checkpoints_error(trained_run):
    """More --trans_checkpoint entries than --trans_model entries would
    be silently zip-truncated; the CLI refuses instead."""
    import pytest

    out, ckpt = trained_run
    with pytest.raises(SystemExit, match="pairing is"):
        main([
            "attack", "cw", "--dataset", "synthetic",
            "--model", "PointNet",
            "--trans_model", "PointNet",
            "--trans_checkpoint", f"{ckpt},{ckpt}",
            "--num_points", "64", "--num_classes", "3",
            "--checkpoint", ckpt, "--output_dir", out,
            "--binary_step", "1", "--num_iter", "30", "--kappa", "0",
            "--budget", "0.45", "--num_samples", "3", "--transfer_test",
        ])


def test_attack_top1_error(trained_run):
    out, ckpt = trained_run
    main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--attack_method", "top1_error",
        "--binary_step", "1", "--num_iter", "30", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "2",
    ])


REF_PUNET_PTH = (
    "/root/reference/attack/SIadv/baselines/defense/DUP_Net/"
    "pu-in_1024-up_4.pth"
)


def test_attack_with_defense(trained_run):
    out, ckpt = trained_run
    main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out, "--defense", "sor",
        "--binary_step", "1", "--num_iter", "20", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "2",
    ])


@pytest.mark.skipif(
    not os.path.exists(REF_PUNET_PTH),
    reason="reference checkout not available",
)
def test_attack_with_dupnet_shipped_weights(trained_run):
    """--defense dupnet runs against the reference's TRAINED upsampler
    (DUP_Net.py:24 hard-loads pu-in_1024-up_4.pth) via
    --defense_checkpoint, not a random init."""
    out, ckpt = trained_run
    main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--defense", "dupnet", "--defense_checkpoint", REF_PUNET_PTH,
        "--binary_step", "1", "--num_iter", "20", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "2",
    ])


def test_dupnet_defense_requires_checkpoint(trained_run):
    """A random upsampler is not a defense: --defense dupnet without
    --defense_checkpoint must refuse, not silently init."""
    out, ckpt = trained_run
    with pytest.raises(SystemExit, match="defense_checkpoint"):
        main([
            "attack", "cw", "--dataset", "synthetic", "--model",
            "PointNet", "--num_points", "64", "--num_classes", "3",
            "--checkpoint", ckpt, "--output_dir", out,
            "--defense", "dupnet",
            "--binary_step", "1", "--num_iter", "5",
            "--num_samples", "2",
        ])


def test_attack_face_probe(trained_run, tmp_path):
    out, ckpt = trained_run
    face = np.random.RandomState(0).randn(200, 5)
    path = str(tmp_path / "face.txt")
    np.savetxt(path, face)
    main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--face_txt", path, "--face_label", "1",
        "--attack_method", "target",
        "--binary_step", "1", "--num_iter", "20", "--kappa", "0",
        "--budget", "0.45",
    ])


def test_attack_face_probe_all_targets(trained_run, tmp_path):
    """--all_targets sweeps every class id as the impersonation target
    in ONE invocation (reference Eval_KNN.py:70-101's target loop,
    shipped truncated to one target) with per-target artifacts."""
    out = str(tmp_path / "sweep")
    _, ckpt = trained_run
    face = np.random.RandomState(0).randn(200, 5)
    path = str(tmp_path / "face.txt")
    np.savetxt(path, face)
    main([
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--face_txt", path, "--face_label", "1",
        "--attack_method", "target", "--all_targets",
        "--binary_step", "1", "--num_iter", "20", "--kappa", "0",
        "--budget", "0.45", "--save_adv",
    ])
    summary = json.load(open(os.path.join(out, "attack_cw_summary.json")))
    assert summary["n"] == 3
    assert set(summary["per_target_success"]) == {"0", "1", "2"}
    dumps = os.listdir(os.path.join(out, "AdvData", "PointNet"))
    assert len(dumps) == 3  # one artifact per target class


def test_all_targets_requires_face_txt(trained_run):
    """Dataset-mode --all_targets must refuse, not silently run a
    single-target attack pretending to be the sweep."""
    out, ckpt = trained_run
    with pytest.raises(SystemExit, match="face_txt"):
        main([
            "attack", "cw", "--dataset", "synthetic", "--model",
            "PointNet", "--num_points", "64", "--num_classes", "3",
            "--checkpoint", ckpt, "--output_dir", out,
            "--attack_method", "target", "--all_targets",
            "--binary_step", "1", "--num_iter", "5", "--num_samples", "2",
        ])


def test_load_dup_variables_orbax_dir(tmp_path):
    """--defense_checkpoint also accepts an orbax/npz dir of PUNet
    variables (not just the reference .pth)."""
    import jax

    from pointcloudattack_tpu.cli.main import _load_dup_variables
    from pointcloudattack_tpu.defense import DUPNet
    from pointcloudattack_tpu.train.checkpoint import save_checkpoint

    dup = DUPNet(npoint=64, up_ratio=4)
    variables = dup.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "dup_ckpt")
    save_checkpoint(path, variables)
    restored = _load_dup_variables(path, 64)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_attack_iso_cli_with_csv_log(trained_run):
    out, ckpt = trained_run
    main([
        "attack", "iso", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--num_iter", "50", "--num_init", "4", "--num_samples", "2",
        "--step_size", "0.05",
    ])
    import csv

    with open(os.path.join(out, "iso_attack_log.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0][:4] == [
        "index", "true_label", "prob_before", "prob_after"
    ]
    assert len(rows) == 3  # header + 2 samples


def test_attack_iso_cli_lockstep(trained_run, tmp_path):
    out = str(tmp_path)
    _, ckpt = trained_run
    main([
        "attack", "iso", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--num_iter", "50", "--num_init", "4", "--num_samples", "2",
        "--step_size", "0.05", "--iso_lockstep",
    ])
    import csv

    with open(os.path.join(out, "iso_attack_log.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 3  # header + 2 samples, same schema as sequential


def test_train_and_attack_dgcnn(tmp_path):
    """Second model family end-to-end through the CLI."""
    out = str(tmp_path)
    main([
        "train", "--dataset", "synthetic", "--model", "DGCNN",
        "--num_points", "64", "--num_classes", "3", "--epochs", "12",
        "--batch_size", "12", "--k", "8", "--emb_dims", "64",
        "--output_dir", out,
    ])
    ckpt = os.path.join(out, "DGCNN_model_on_synthetic")
    asr = main([
        "attack", "cw", "--dataset", "synthetic", "--model", "DGCNN",
        "--num_points", "64", "--num_classes", "3", "--k", "8",
        "--emb_dims", "64", "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "1", "--num_iter", "50", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "4",
    ])
    assert asr >= 0.5


def test_attack_cw_robust_1d_cli(trained_run):
    """additional_exp twin through the CLI, default z-only mode."""
    out, ckpt = trained_run
    asr = main([
        "attack", "cw-robust", "--dataset", "synthetic",
        "--model", "PointNet", "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "3", "--num_iter", "150", "--kappa", "0",
        "--whether_1d", "1", "--num_samples", "4", "--save_adv",
    ])
    assert asr >= 0.5
    summary = json.load(
        open(os.path.join(out, "attack_cw-robust_summary.json"))
    )
    assert summary["family"] == "cw-robust"
    # z-only: dumped adv clouds must match the clean x/y columns
    adv_dir = os.path.join(out, "AdvData", "PointNet")
    fn = sorted(f for f in os.listdir(adv_dir) if f.startswith("cw-robust"))
    assert fn, "no cw-robust adv dumps written"


def test_attack_geoa3_partial_cli(trained_run):
    out, ckpt = trained_run
    asr = main([
        "attack", "geoa3-partial", "--dataset", "synthetic",
        "--model", "PointNet", "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "2", "--num_iter", "50",
        "--knn_range", "8", "--refresh_iters", "25",
        "--num_samples", "4",
    ])
    assert asr >= 0.0  # patch attack on tiny clouds: just run e2e
    summary = json.load(
        open(os.path.join(out, "attack_geoa3-partial_summary.json"))
    )
    assert summary["family"] == "geoa3-partial"


def test_view_cli(tmp_path):
    cloud = str(tmp_path / "cloud.txt")
    np.savetxt(cloud, np.random.RandomState(0).randn(128, 3))
    frame = str(tmp_path / "f.ppm")
    main(["view", cloud, "--cmds", "nsq", "--out", frame, "--size", "128"])
    assert os.path.exists(frame)


def test_platform_flag(trained_run):
    """--platform pins jax_platforms before backend init (no-op here:
    conftest already pinned cpu, so passing cpu must work and anything
    else is rejected at parse time)."""
    out, ckpt = trained_run
    acc = main([
        "test", "--platform", "cpu", "--dataset", "synthetic",
        "--model", "PointNet", "--num_points", "64",
        "--num_classes", "3", "--checkpoint", ckpt, "--output_dir", out,
    ])
    assert acc == 1.0
    with pytest.raises(SystemExit):
        main(["test", "--platform", "mps"])


def test_attack_cw_chunked_and_resume(trained_run, tmp_path, capsys):
    """--attack_batch runs the sweep in fixed-shape chunks (last chunk
    edge-padded) with per-chunk result files; --resume replays finished
    chunks from disk and a config change invalidates them."""
    out = str(tmp_path / "chunked")
    _, ckpt = trained_run
    argv = [
        "attack", "cw", "--dataset", "synthetic", "--model", "PointNet",
        "--num_points", "64", "--num_classes", "3",
        "--checkpoint", ckpt, "--output_dir", out,
        "--binary_step", "2", "--num_iter", "50", "--kappa", "0",
        "--budget", "0.45", "--num_samples", "6", "--attack_batch", "4",
    ]
    asr = main(argv)
    assert asr >= 0.8
    chunk_dir = os.path.join(out, "attack_chunks")
    files = sorted(os.listdir(chunk_dir))
    assert files == ["cw_00000.npz", "cw_00001.npz"]
    # the padded final chunk is sliced back to its true size
    assert np.load(os.path.join(chunk_dir, files[0]))["adv"].shape[0] == 4
    assert np.load(os.path.join(chunk_dir, files[1]))["adv"].shape[0] == 2
    summary = json.load(open(os.path.join(out, "attack_cw_summary.json")))
    assert summary["n"] == 6
    capsys.readouterr()

    # resume: both chunks replay from disk, same aggregate ASR
    asr2 = main(argv + ["--resume"])
    assert asr2 == asr
    assert capsys.readouterr().out.count("resumed from") == 2

    # config fingerprint: changing an attack knob invalidates the chunks
    argv_kappa = [a for a in argv]
    argv_kappa[argv_kappa.index("--kappa") + 1] = "1.0"
    main(argv_kappa + ["--resume"])
    assert capsys.readouterr().out.count("stale chunk file") == 2

    # a truncated chunk file (sweep killed mid-np.savez) re-runs that
    # chunk instead of crashing the restart
    with open(os.path.join(chunk_dir, files[0]), "wb") as f:
        f.write(b"PK\x03\x04 truncated")
    asr3 = main(argv_kappa + ["--resume"])
    out3 = capsys.readouterr().out
    assert out3.count("unreadable chunk file") == 1
    assert out3.count("resumed from") == 1
    assert np.load(os.path.join(chunk_dir, files[0]))["adv"].shape[0] == 4
    assert asr3 >= 0.0  # aggregate still produced


def test_chunk_fingerprint_covers_attack_knobs(tmp_path):
    """--resume's fingerprint must cover EVERY result-affecting flag
    (the round-3 review found --adv_func/--nn_refresh/... missing from
    a hand-picked include list) while ignoring artifact-only flags."""
    from pointcloudattack_tpu.cli.main import (
        _chunk_fingerprint,
        build_parser,
        run_config_from_args,
    )

    base = [
        "attack", "cw", "--dataset", "synthetic", "--num_points", "64",
        "--num_samples", "6", "--attack_batch", "4",
    ]

    def fp(extra):
        args = build_parser().parse_args(base + extra)
        return _chunk_fingerprint(
            args, run_config_from_args(args), "cw", 6
        )

    ref = fp([])
    # every result-affecting knob must invalidate finished chunks
    for extra in (
        ["--adv_func", "cross_entropy"],
        ["--nn_refresh", "5"],
        ["--curv_knn_refresh", "4"],
        ["--hd_loss_weight", "0.5"],
        ["--target_class", "2"],
        ["--use_jitter", "1"],
        ["--defense_checkpoint", "w.pth"],
        ["--surrogate_checkpoint", "s.pth"],
    ):
        assert fp(extra) != ref, extra
    # artifact/observability flags must NOT (or --resume could never
    # reuse anything)
    for extra in (
        ["--output_dir", str(tmp_path / "elsewhere")],
        ["--resume"],
        ["--save_adv"],
        ["--transfer_test"],
    ):
        assert fp(extra) == ref, extra


def test_attack_batch_rejected_for_iso(trained_run):
    out, ckpt = trained_run
    with pytest.raises(SystemExit, match="attack_batch"):
        main([
            "attack", "iso", "--dataset", "synthetic", "--model",
            "PointNet", "--num_points", "64", "--num_classes", "3",
            "--checkpoint", ckpt, "--output_dir", out,
            "--num_samples", "4", "--attack_batch", "2",
        ])


def test_fused_fallback_disables_and_retries():
    """_attack_with_fused_fallback: a failure with the fused kernels
    enabled flips the process-wide kill switch, clears the builder memo,
    and retries once on the XLA path (bench.py::_run_family twin)."""
    from pointcloudattack_tpu.cli.main import (
        _BUILD_MEMO,
        _attack_with_fused_fallback,
    )
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL

    prior = dict(FUSED_MAXPOOL)
    FUSED_MAXPOOL["enabled"] = True
    # pin the gather/ballq tiers OFF so this test isolates the
    # chain-tier fallback (tri-state default None = policy would make
    # the tiered de-escalation try them first — those paths have their
    # own tests below)
    FUSED_MAXPOOL["gather"] = False
    FUSED_MAXPOOL["ballq"] = False
    _BUILD_MEMO["sentinel"] = object()
    calls = []

    def run():
        calls.append(FUSED_MAXPOOL["enabled"])
        if FUSED_MAXPOOL["enabled"]:
            raise RuntimeError("Mosaic failed to lower")
        return "ok"

    try:
        assert _attack_with_fused_fallback(run) == "ok"
        assert calls == [True, False]
        assert "sentinel" not in _BUILD_MEMO
        assert FUSED_MAXPOOL["disabled_reason"].startswith("Mosaic")
        # with the kernels already off, failures propagate unchanged
        with pytest.raises(RuntimeError, match="plain"):
            _attack_with_fused_fallback(
                lambda: (_ for _ in ()).throw(RuntimeError("plain"))
            )
    finally:
        FUSED_MAXPOOL.update(prior)


def test_fused_fallback_deescalates_gather_first():
    """With the opt-in gather fusion on, a Mosaic failure disables the
    gather tier FIRST and only escalates to the default-on chain
    kernels if the failure persists — a rejected experimental kernel
    must not throw away the measured-good chain kernels."""
    from pointcloudattack_tpu.cli.main import _attack_with_fused_fallback
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL

    prior = dict(FUSED_MAXPOOL)
    FUSED_MAXPOOL["enabled"] = True
    FUSED_MAXPOOL["gather"] = True
    FUSED_MAXPOOL["ballq"] = False  # the ballq tier has its own test
    states = []
    try:
        # failure disappears once gather is off: chain kernels survive
        def run_gather_bad():
            states.append(
                (FUSED_MAXPOOL["gather"], FUSED_MAXPOOL["enabled"])
            )
            if FUSED_MAXPOOL["gather"]:
                raise RuntimeError("Mosaic lowering failed for kernel")
            return "ok"

        assert _attack_with_fused_fallback(run_gather_bad) == "ok"
        assert states == [(True, True), (False, True)]
        assert FUSED_MAXPOOL["enabled"]

        # persistent failure escalates tier by tier, then re-raises
        FUSED_MAXPOOL["gather"] = True
        states.clear()

        def run_always_bad():
            states.append(
                (FUSED_MAXPOOL["gather"], FUSED_MAXPOOL["enabled"])
            )
            raise RuntimeError("Mosaic lowering failed for kernel")

        with pytest.raises(RuntimeError, match="Mosaic"):
            _attack_with_fused_fallback(run_always_bad)
        assert states == [(True, True), (False, True), (False, False)]
    finally:
        FUSED_MAXPOOL.update(prior)


def test_fused_fallback_deescalates_ballq_before_gather():
    """The ballq tier (in-kernel ball query) sits ABOVE gather in the
    de-escalation order: a Mosaic failure disables ballq first; the
    gather and chain tiers survive if the failure clears."""
    from pointcloudattack_tpu.cli.main import _attack_with_fused_fallback
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL

    prior = dict(FUSED_MAXPOOL)
    FUSED_MAXPOOL["enabled"] = True
    FUSED_MAXPOOL["gather"] = True
    FUSED_MAXPOOL["ballq"] = True
    states = []
    try:
        def run_ballq_bad():
            states.append((
                FUSED_MAXPOOL["ballq"], FUSED_MAXPOOL["gather"],
                FUSED_MAXPOOL["enabled"],
            ))
            if FUSED_MAXPOOL["ballq"]:
                raise RuntimeError("Mosaic lowering failed for kernel")
            return "ok"

        assert _attack_with_fused_fallback(run_ballq_bad) == "ok"
        assert states == [(True, True, True), (False, True, True)]
        assert FUSED_MAXPOOL["gather"] and FUSED_MAXPOOL["enabled"]
    finally:
        FUSED_MAXPOOL.update(prior)


def test_fused_fallback_reraises_unrelated_errors(monkeypatch):
    """A failure that is NOT a Mosaic/Pallas rejection must re-raise
    immediately (not silently disable the kernels and re-run a possibly
    multi-hour sweep on the slow path with a misattributed cause);
    PCA_FUSED_FALLBACK_ANY=1 restores catch-everything insurance."""
    from pointcloudattack_tpu.cli.main import _attack_with_fused_fallback
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL

    prior = dict(FUSED_MAXPOOL)
    FUSED_MAXPOOL["enabled"] = True
    try:
        with pytest.raises(FileNotFoundError):
            _attack_with_fused_fallback(
                lambda: (_ for _ in ()).throw(
                    FileNotFoundError("missing checkpoint s.pth")
                )
            )
        assert FUSED_MAXPOOL["enabled"]  # unrelated error: kernels stay on

        monkeypatch.setenv("PCA_FUSED_FALLBACK_ANY", "1")
        # gather=False pins the broad-insurance path to a single tier;
        # tri-state None (policy) would count as "still on" and insert a
        # gather/ballq-off retry first (tiered sequence pinned by
        # test_fused_fallback_deescalates_gather_first).
        FUSED_MAXPOOL["gather"] = False
        FUSED_MAXPOOL["ballq"] = False
        calls = []

        def run():
            calls.append(FUSED_MAXPOOL["enabled"])
            if FUSED_MAXPOOL["enabled"]:
                raise FileNotFoundError("missing checkpoint s.pth")
            return "ok"

        assert _attack_with_fused_fallback(run) == "ok"
        assert calls == [True, False]

        # policy-mode gather (None) counts as a live tier under broad
        # insurance: the same unrelated error de-escalates gather first,
        # then the chain kernels.
        FUSED_MAXPOOL.update(enabled=True, gather=None)
        calls.clear()
        assert _attack_with_fused_fallback(run) == "ok"
        assert calls == [True, True, False]
        assert FUSED_MAXPOOL["gather"] is False
    finally:
        FUSED_MAXPOOL.update(prior)
