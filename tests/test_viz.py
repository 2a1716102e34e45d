"""Visualization tests: native + numpy renderers agree; plots compute."""

import numpy as np
import pytest

from pointcloudattack_tpu.viz import render as R
from pointcloudattack_tpu.viz import plots

RNG = np.random.RandomState(44)


def test_numpy_render_basic():
    pts = RNG.randn(200, 3)
    img = R.render_cloud(pts, size=64, radius=2, use_native=False)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0  # something was drawn


def test_native_render_matches_numpy():
    lib = R._load_library()
    if lib is None:
        pytest.skip("no g++ toolchain for the native renderer")
    pts = RNG.randn(100, 3)
    a = R.render_cloud(pts, size=64, radius=2, use_native=True)
    b = R.render_cloud(pts, size=64, radius=2, use_native=False)
    # identical splatting algorithm -> nearly identical pixels
    assert (a != b).mean() < 0.01


def test_depth_ordering():
    """A front point must occlude a back point at the same pixel."""
    pts = np.array([[0.0, 0.0, -0.5], [0.0, 0.0, 0.5]])
    colors = np.array([[255.0, 0, 0], [0, 255.0, 0]])
    img = R.render_cloud(
        pts, size=32, radius=3, color=colors, use_native=False
    )
    center = img[16, 16]
    assert center[1] > center[0]  # green (front) wins


def test_rotation_matrix_orthonormal():
    r = R.rotation_matrix(0.5, -0.3)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)


def test_save_ppm(tmp_path):
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[0, 0] = [255, 128, 0]
    path = str(tmp_path / "out.ppm")
    R.save_ppm(path, img)
    with open(path, "rb") as f:
        header = f.readline()
        assert header == b"P6\n"


def test_convergence_and_loss_plots(tmp_path):
    lh = np.stack(
        [np.linspace(1.0, 0.1, 50) + 0.01 * RNG.rand(50) for _ in range(4)],
        axis=1,
    )
    idx = plots.plot_convergence_hist(lh, str(tmp_path / "conv.png"))
    assert idx.shape == (4,)
    curve = plots.plot_loss_curves(lh, str(tmp_path / "loss.png"))
    assert len(curve) == 50


def test_inspect_helpers(trained_pointnet, tmp_path):
    from pointcloudattack_tpu.viz import inspect
    from pointcloudattack_tpu.utils.apply import make_model_fn

    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    img, pred = inspect.render_classification(
        model_fn, clouds[0], str(tmp_path / "cls.ppm"), size=64
    )
    assert pred == labels[0]
    seg = (clouds[0][:, 2] > 0).astype(int)
    img = inspect.render_segmentation(clouds[0], seg, size=64)
    assert img.shape == (64, 64, 3)
    img = inspect.render_perturbation(
        clouds[0], clouds[0] + 0.05, size=64
    )
    assert img.shape == (64, 64, 3)


class TestInteractiveViewer:
    """Headless twin of reference show3d_balls.showpoints (:60-164)."""

    def _cloud(self, n=200):
        return np.random.RandomState(0).randn(n, 3).astype(np.float32)

    def test_scripted_session_state_transitions(self, tmp_path):
        from pointcloudattack_tpu.viz.viewer import showpoints

        out = str(tmp_path / "frame.ppm")
        # zoom in twice, rotate, switch to pred colors, save, quit
        state = showpoints(
            self._cloud(),
            c_pred=np.tile([255.0, 0.0, 0.0], (200, 1)),
            cmds=list("nnjjps q".replace(" ", "")),
            out_path=out,
            display=False,
        )
        assert state.quit
        assert abs(state.zoom - 1.1**2) < 1e-9
        assert state.color_mode == "pred"
        import os

        assert os.path.exists(out)
        with open(out, "rb") as f:
            assert f.readline().startswith(b"P6")

    def test_reset_key(self):
        from pointcloudattack_tpu.viz.viewer import (
            ViewerState,
            apply_command,
        )

        s = ViewerState()
        for c in "nnjik":
            s = apply_command(s, c)
        s = apply_command(s, "r")
        assert s.zoom == 1.0 and s.yaw == 0.0 and s.pitch == 0.0

    def test_ansi_frame_shape(self):
        from pointcloudattack_tpu.viz.viewer import ansi_frame
        from pointcloudattack_tpu.viz.render import render_cloud

        img = render_cloud(self._cloud(), size=128)
        art = ansi_frame(img, cols=32)
        lines = art.split("\n")
        assert len(lines) == 16  # 32 rows / 2 per half-block line
        assert "▀" in lines[0]
