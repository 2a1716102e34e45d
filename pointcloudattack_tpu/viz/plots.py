"""Convergence / loss curve plots of attack runs.

Counterpart of reference attack/GeoA3/utility.py:653-713
(Count_converge_iter / Count_loss_iter): histogram of the iteration at
which each example's attack converged, and mean per-iteration loss
curves.  Matplotlib is imported lazily and everything degrades to
returning the computed arrays when it is unavailable.
"""

from __future__ import annotations

import numpy as np


def convergence_iterations(loss_history: np.ndarray, tol: float = 1e-4):
    """First iteration after which each example's loss stops improving.

    Args:
      loss_history: [num_iters, B] per-iteration per-example losses.

    Returns:
      [B] int iteration indices.
    """
    lh = np.asarray(loss_history)
    # strict improvement over the PREVIOUS running best; a plateau (the
    # margin losses clamp to a constant after success) must not count
    best = np.minimum.accumulate(lh, axis=0)
    prev_best = np.concatenate(
        [np.full((1, lh.shape[1]), np.inf), best[:-1]], axis=0
    )
    improved = lh < prev_best - tol
    idx = np.zeros(lh.shape[1], dtype=np.int64)
    for b in range(lh.shape[1]):
        w = np.where(improved[:, b])[0]
        idx[b] = w[-1] if len(w) else 0
    return idx


def plot_convergence_hist(loss_history, path: str | None = None):
    """Histogram of convergence iterations; returns the indices."""
    idx = convergence_iterations(loss_history)
    if path is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.hist(idx, bins=30)
            ax.set_xlabel("convergence iteration")
            ax.set_ylabel("num clouds")
            fig.savefig(path, dpi=120)
            plt.close(fig)
        except Exception:
            pass
    return idx


def plot_loss_curves(loss_history, path: str | None = None):
    """Mean loss per iteration; returns the curve."""
    lh = np.asarray(loss_history)
    curve = lh.mean(axis=1)
    if path is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.plot(curve)
            ax.set_xlabel("iteration")
            ax.set_ylabel("mean loss")
            fig.savefig(path, dpi=120)
            plt.close(fig)
        except Exception:
            pass
    return curve
