"""Interactive point-cloud viewer (headless-native show3d).

Behavioral twin of reference utils/show3d_balls.py:60-164 (``showpoints``
— an OpenCV window with keyboard controls).  This image has no OpenCV
and no display, so the shell renders through viz/render.py's z-buffer
(the ported C++ renderer) and presents frames as ANSI truecolor
half-block art on a TTY, with the same keyboard command set:

  n / m   zoom in / out (x1.1)            (show3d_balls.py:147-152)
  r       reset zoom                      (:153-155)
  t / p   color by ground-truth / pred    (:120-145)
  j / l   yaw left / right   (the reference rotates via mouse drag,
  i / k   pitch up / down     :44-74 — keys replace the mouse here)
  s       save frame to <out_path>        (:156-157)
  q       quit                            (:113-114)

``showpoints`` takes an optional ``cmds`` iterable so scripts and tests
can drive the loop without a TTY; interactively it reads single keys
from stdin.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Iterable, Iterator

import numpy as np

from pointcloudattack_tpu.viz.render import (
    render_cloud,
    rotation_matrix,
    save_ppm,
)


@dataclasses.dataclass
class ViewerState:
    zoom: float = 1.0
    yaw: float = 0.0
    pitch: float = 0.0
    color_mode: str = "default"  # "default" | "gt" | "pred"
    quit: bool = False
    save: bool = False  # one-shot flag consumed by the loop

    def rotation(self) -> np.ndarray:
        return rotation_matrix(yaw=self.yaw, pitch=self.pitch)


_YAW_STEP = np.pi / 12
_PITCH_STEP = np.pi / 24


def apply_command(state: ViewerState, cmd: str) -> ViewerState:
    """Pure state transition for one keyboard command."""
    s = dataclasses.replace(state, save=False)
    if cmd == "n":
        s.zoom *= 1.1
    elif cmd == "m":
        s.zoom /= 1.1
    elif cmd == "r":
        s.zoom, s.yaw, s.pitch = 1.0, 0.0, 0.0
    elif cmd == "t":
        s.color_mode = "gt"
    elif cmd == "p":
        s.color_mode = "pred"
    elif cmd == "j":
        s.yaw -= _YAW_STEP
    elif cmd == "l":
        s.yaw += _YAW_STEP
    elif cmd == "i":
        s.pitch -= _PITCH_STEP
    elif cmd == "k":
        s.pitch += _PITCH_STEP
    elif cmd == "s":
        s.save = True
    elif cmd == "q":
        s.quit = True
    return s


def _frame(xyz, state: ViewerState, c_gt, c_pred, size: int) -> np.ndarray:
    color = None
    if state.color_mode == "gt" and c_gt is not None:
        color = c_gt
    elif state.color_mode == "pred" and c_pred is not None:
        color = c_pred
    if color is not None:
        # normalizecolor semantics of the reference (:137-143)
        color = np.asarray(color, dtype=np.float32)
        color = color / (color.max(axis=0) + 1e-14) * 255.0
    return render_cloud(
        xyz * state.zoom,
        size=size,
        rotation=state.rotation(),
        color=color,
    )


def ansi_frame(image: np.ndarray, cols: int = 64) -> str:
    """RGB image -> ANSI truecolor half-block art (2 pixels per cell)."""
    h, w, _ = image.shape
    step = max(1, w // cols)
    img = image[::step, ::step]
    if img.shape[0] % 2:
        img = img[:-1]
    top, bot = img[0::2], img[1::2]
    lines = []
    for tr, br in zip(top, bot):
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
            f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(tr, br)
        ]
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


def _stdin_keys() -> Iterator[str]:
    """Single-key reader; falls back to line mode off a TTY."""
    if sys.stdin.isatty():
        import termios
        import tty

        fd = sys.stdin.fileno()
        old = termios.tcgetattr(fd)
        try:
            while True:
                tty.setcbreak(fd)
                yield sys.stdin.read(1)
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)
    else:
        for line in sys.stdin:
            for ch in line.strip():
                yield ch


def showpoints(
    xyz: np.ndarray,
    c_gt: np.ndarray | None = None,
    c_pred: np.ndarray | None = None,
    *,
    cmds: Iterable[str] | None = None,
    out_path: str = "show3d.ppm",
    size: int = 256,
    display: bool = True,
    stream=None,
) -> ViewerState:
    """Interactive viewer loop (reference showpoints, :34-160).

    Args:
      xyz: [N, 3] cloud.
      c_gt / c_pred: optional [N, 3] per-point colors for the t / p keys.
      cmds: scripted command characters (tests / batch use); None reads
        keys from stdin.
      out_path: where the 's' key writes the PPM frame.
      display: print ANSI frames (auto-disabled when stream is None and
        stdout is not a TTY).
      stream: where ANSI frames go (default sys.stdout when displaying).

    Returns the final ViewerState.
    """
    xyz = np.asarray(xyz, dtype=np.float32)
    state = ViewerState()
    keys = iter(cmds) if cmds is not None else _stdin_keys()
    if stream is None:
        stream = sys.stdout if sys.stdout.isatty() else None
    show = display and stream is not None

    while True:
        frame = _frame(xyz, state, c_gt, c_pred, size)
        if state.save:
            save_ppm(out_path, frame)
        if show:
            print(ansi_frame(frame), file=stream)
            print(
                f"zoom {state.zoom * 100:.0f}%  "
                f"yaw {np.degrees(state.yaw):.0f}  "
                f"pitch {np.degrees(state.pitch):.0f}  "
                f"color {state.color_mode}  [n/m/r/t/p/j/l/i/k/s/q]",
                file=stream,
            )
        cmd = next(keys, None)
        if cmd is None or state.quit:
            break
        state = apply_command(state, cmd)
        if state.quit:
            # render-and-save semantics finished; exit like 'q' (:113)
            break
    return state
