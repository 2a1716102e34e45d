"""Point-cloud rendering: C++ z-buffer splatter with numpy fallback.

Counterpart of the reference viewer stack (utils/show3d_balls.py +
utils/render_balls_so.cpp): ``render_cloud`` produces an RGB image of a
cloud; the native .so is compiled on first use (g++) and loaded through
ctypes; environments without a toolchain fall back to an equivalent
(slower) numpy renderer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_FAILED = False


def _load_library():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    so_path = os.path.join(here, "render_balls.bin")
    src = os.path.join(here, "render_balls.cpp")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(
            so_path
        ) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.render_balls.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),  # image
            ctypes.c_int, ctypes.c_int,      # h, w
            ctypes.POINTER(ctypes.c_float),  # zbuf
            ctypes.POINTER(ctypes.c_float),  # xyz
            ctypes.POINTER(ctypes.c_float),  # color
            ctypes.c_int, ctypes.c_int,      # n, radius
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def _render_numpy(image, zbuf, xyz, color, radius):
    h, w, _ = image.shape
    r2 = radius * radius
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disc = dy * dy + dx * dx <= r2
    bump = np.sqrt(np.maximum(r2 - (dy * dy + dx * dx), 0.0))
    shade = 0.4 + 0.6 * bump / max(radius, 1)
    for i in range(len(xyz)):
        x0, y0, z0 = int(xyz[i, 0]), int(xyz[i, 1]), xyz[i, 2]
        ys, xs = y0 + dy[disc], x0 + dx[disc]
        zs = z0 + bump[disc]
        sh = shade[disc]
        ok = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
        ys, xs, zs, sh = ys[ok], xs[ok], zs[ok], sh[ok]
        better = zs > zbuf[ys, xs]
        ys, xs, zs, sh = ys[better], xs[better], zs[better], sh[better]
        zbuf[ys, xs] = zs
        image[ys, xs] = np.clip(
            color[i][None, :] * sh[:, None], 0, 255
        ).astype(np.uint8)
    return image


def render_cloud(
    points: np.ndarray,
    *,
    size: int = 512,
    radius: int = 3,
    color: np.ndarray | None = None,
    background: int = 0,
    rotation: np.ndarray | None = None,
    use_native: bool = True,
) -> np.ndarray:
    """Render a [N, 3] cloud to an RGB uint8 image [size, size, 3].

    Points are centered, scaled to fit, optionally rotated, projected
    orthographically (x right, y down, z toward the viewer).
    """
    pts = np.asarray(points, dtype=np.float64)
    pts = pts - pts.mean(axis=0, keepdims=True)
    scale = np.abs(pts).max() + 1e-9
    pts = pts / scale
    if rotation is not None:
        pts = pts @ np.asarray(rotation).T

    margin = 0.85
    xy = (pts[:, :2] * margin * 0.5 + 0.5) * (size - 1)
    xyz = np.stack([xy[:, 0], xy[:, 1], pts[:, 2]], axis=1).astype(
        np.float32
    )
    if color is None:
        # depth-tinted default palette
        t = (pts[:, 2] - pts[:, 2].min()) / (np.ptp(pts[:, 2]) + 1e-9)
        color = np.stack(
            [100 + 155 * t, 120 + 80 * (1 - t), 255 - 155 * t], axis=1
        )
    color = np.ascontiguousarray(color, dtype=np.float32)

    image = np.full((size, size, 3), background, dtype=np.uint8)
    zbuf = np.full((size, size), -np.inf, dtype=np.float32)

    lib = _load_library() if use_native else None
    if lib is not None:
        xyz_c = np.ascontiguousarray(xyz)
        lib.render_balls(
            image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size, size,
            zbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            xyz_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            color.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(xyz_c), radius,
        )
        return image
    return _render_numpy(image, zbuf, xyz, color, radius)


def rotation_matrix(yaw: float = 0.0, pitch: float = 0.0) -> np.ndarray:
    """Viewer rotation like the interactive reference viewer's drag."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return rx @ ry


def save_ppm(path: str, image: np.ndarray):
    """Write an RGB uint8 image as binary PPM (no imaging deps)."""
    h, w, _ = image.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(image).tobytes())
