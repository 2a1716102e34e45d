"""Persistent XLA compilation cache for CLI / benchmark entry points.

Every CLI invocation is a fresh process, and on the axon TPU the first
compile of an attack shape goes through the remote-compile tunnel
(minutes).  JAX's persistent compilation cache makes any previously
compiled executable load from disk instead: measured on this machine,
a 76.5 s first compile replays in 2.0 s from a second process.

Axon caveat (measured round 3): the cache short-circuits the CLIENT
compile only — ``lowered.compile()`` returns in <0.1 s on a hit, but
the tunnel defers the server-side program build/load to the FIRST
EXECUTION of each executable, which still takes ~60-130 s per distinct
computation per process (repeat calls ~0.2 s).  The cache is still a
net win (it removes the client compile and all retrace work), but CLI
wall time is dominated by one first-execute load per distinct jitted
computation, so prefer FEWER, LARGER jitted computations per run.

Enabled by default from ``cli`` and ``bench.py``; tests do not use it
(they run tiny CPU compiles).  Controls:

  * ``PCA_COMPILE_CACHE=0``      disable entirely
  * ``PCA_COMPILE_CACHE_DIR=...`` override the cache directory
    (default ``~/.cache/pointcloudattack_tpu/xla``)
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache. Returns the dir or None.

    Safe to call multiple times; must run before the first compilation
    to benefit it (later calls still help subsequent compiles).
    """
    if os.environ.get("PCA_COMPILE_CACHE", "1") in ("0", "false", "no"):
        return None

    import jax

    # The cache exists to beat the axon TPU tunnel's minutes-long remote
    # compiles; CPU compiles are fast, and XLA:CPU AOT cache entries are
    # NOT portable across hosts (replaying one compiled on a machine
    # with different vector features warns "could lead to ... SIGILL").
    # Skip when the caller pinned the CPU backend (--platform cpu /
    # jax.config jax_platforms), which is exactly the cross-host case.
    platforms = getattr(jax.config, "jax_platforms", None) or ""
    if platforms.split(",")[0].strip().lower() == "cpu":
        return None
    cache_dir = (
        path
        or os.environ.get("PCA_COMPILE_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "pointcloudattack_tpu", "xla"
        )
    )
    os.makedirs(cache_dir, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default threshold (1 s) skips small kernels; 0.5 s measured best on
    # the axon tunnel (0.1 s adds cache round-trips without wall-time win)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
