"""Synthetic point-cloud datasets for tests and benchmarks.

Class c is a unit-normalized noisy shape with class-dependent anisotropy —
trivially separable, so a few training steps reach 100% accuracy and attack
smoke tests can assert ASR == 1.0 (the reference has no tests at all;
SURVEY.md §4 calls for exactly this kind of end-to-end fixture).
"""

from __future__ import annotations

import numpy as np


def make_synthetic_clouds(
    num_classes: int,
    per_class: int,
    num_points: int,
    seed: int = 0,
):
    """Returns (clouds [M, N, 3] float32, labels [M] int32)."""
    rng = np.random.RandomState(seed)
    clouds, labels = [], []
    for c in range(num_classes):
        # class-specific axis scaling + fixed rotation
        scale = np.float32([1.0 + 0.8 * c, 1.0 / (1.0 + 0.5 * c), 1.0])
        theta = np.pi * c / max(num_classes, 1)
        rot = np.float32(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
        for _ in range(per_class):
            pts = rng.randn(num_points, 3).astype(np.float32) * scale
            pts = pts @ rot.T
            pts -= pts.mean(axis=0, keepdims=True)
            pts /= np.abs(pts).max() + 1e-9
            clouds.append(pts)
            labels.append(c)
    clouds = np.stack(clouds)
    labels = np.asarray(labels, dtype=np.int32)
    perm = rng.permutation(len(labels))
    return clouds[perm], labels[perm]
