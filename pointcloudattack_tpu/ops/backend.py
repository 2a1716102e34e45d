"""Backend dispatch policy for TPU-specialized op paths."""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True when the default JAX backend is a TPU.

    The single source of truth for "use the Pallas/MXU path" decisions
    (ball query, chamfer kernel, FPS kernel).
    """
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - uninitialized backends
        return False
