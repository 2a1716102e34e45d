"""Backend dispatch policy for TPU-specialized op paths."""

from __future__ import annotations

import contextlib

import jax

_MANUAL_DEPTH = 0  # >0 while tracing inside a shard_map manual region
_FORCE_XLA_DEPTH = 0  # >0 while every Pallas dispatch gate is forced off


def is_tpu_backend() -> bool:
    """True when the default JAX backend is a TPU.

    The single source of truth for "use the TPU/MXU path" decisions
    (ball query, one-hot gathers); Pallas kernels additionally gate on
    :func:`use_mosaic_kernels`.
    """
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - uninitialized backends
        return False


@contextlib.contextmanager
def manual_sharding_scope():
    """Mark a region whose computations trace inside shard_map.

    Mosaic (Pallas) custom calls cannot be auto-partitioned by GSPMD —
    jax raises 'Mosaic kernels cannot be automatically partitioned' when
    a multi-device jit contains one (jax/_src/tpu_custom_call.py).  The
    sharded drivers (parallel/driver.py) therefore wrap per-shard work
    in shard_map and trace it under this scope, which re-enables the
    kernels for the shard-local (manual-axes) computation.
    """
    global _MANUAL_DEPTH
    _MANUAL_DEPTH += 1
    try:
        yield
    finally:
        _MANUAL_DEPTH -= 1


@contextlib.contextmanager
def force_xla_paths():
    """Trace with every Pallas gate off while keeping the TPU-shaped
    XLA paths (``is_tpu_backend`` untouched).

    For lowering a TPU-process trace onto the CPU backend — Pallas
    Mosaic calls have no CPU lowering ("Only interpret mode is
    supported"), which silently nulled the bench's FLOP accounting for
    every kNN/FPS/chamfer-kernel family (bench.py::_flops_unfused) and
    breaks CPU-mesh dry runs started from a TPU process.
    """
    global _FORCE_XLA_DEPTH
    _FORCE_XLA_DEPTH += 1
    try:
        yield
    finally:
        _FORCE_XLA_DEPTH -= 1


def use_mosaic_kernels() -> bool:
    """Pallas dispatch gate: TPU backend AND partition-safe context.

    A single-device process is always safe; a multi-device process is
    safe only inside :func:`manual_sharding_scope` (shard_map).  Plain
    single-device jits in a multi-device process conservatively fall
    back to the XLA paths.
    """
    if _FORCE_XLA_DEPTH > 0:
        return False
    if not is_tpu_backend():
        return False
    try:
        if jax.device_count() == 1:
            return True
    except Exception:  # pragma: no cover
        return False
    return _MANUAL_DEPTH > 0
