"""Minimal run logger (reference attack/SIadv/utils/logging.py:7-15)."""

from __future__ import annotations

import os
import sys
import time


class RunLogger:
    """Print + append-to-file logger with timestamps."""

    def __init__(self, path: str | None = None, echo: bool = True):
        self.echo = echo
        self._f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")

    def log(self, msg: str):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        if self.echo:
            print(line, file=sys.stderr)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


def enable_debug_nans():
    """Debug-mode NaN checking — the moral equivalent of the reference's
    scattered sanity asserts (SURVEY.md §5.2)."""
    import jax

    jax.config.update("jax_debug_nans", True)
