"""Visual spot-checks of classifier behavior.

Counterpart of reference utils/show_cls.py / show_seg.py: render a cloud
(optionally colored by per-point segmentation labels or by clean-vs-
adversarial displacement) alongside the model's prediction.
"""

from __future__ import annotations

import numpy as np

from pointcloudattack_tpu.viz.render import render_cloud, save_ppm

_PALETTE = np.float32(
    [
        [230, 80, 60], [60, 160, 230], [90, 200, 90], [240, 190, 60],
        [170, 100, 220], [240, 130, 40], [100, 220, 210], [200, 200, 200],
    ]
)


def render_classification(
    model_fn, cloud: np.ndarray, path: str | None = None, size: int = 512
):
    """Render a single [N, 3] cloud; returns (image, predicted class)."""
    import jax.numpy as jnp

    logits = np.asarray(model_fn(jnp.asarray(cloud[None])))
    pred = int(np.argmax(logits, -1).reshape(-1)[0])
    img = render_cloud(cloud, size=size)
    if path:
        save_ppm(path, img)
    return img, pred


def render_segmentation(
    cloud: np.ndarray, seg: np.ndarray, path: str | None = None,
    size: int = 512,
):
    """Render with per-point part colors (reference show_seg.py)."""
    colors = _PALETTE[np.asarray(seg) % len(_PALETTE)]
    img = render_cloud(cloud, size=size, color=colors)
    if path:
        save_ppm(path, img)
    return img


def render_perturbation(
    clean: np.ndarray, adv: np.ndarray, path: str | None = None,
    size: int = 512,
):
    """Render the adversarial cloud heat-colored by displacement."""
    disp = np.linalg.norm(adv - clean, axis=-1)
    t = disp / (disp.max() + 1e-9)
    colors = np.stack(
        [80 + 175 * t, 160 * (1 - t) + 40, 200 * (1 - t)], axis=1
    )
    img = render_cloud(adv, size=size, color=colors)
    if path:
        save_ppm(path, img)
    return img
