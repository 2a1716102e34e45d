"""Attack evaluation helpers: defense pre-heads, transfer matrix,
shuffle robustness.

Counterparts of:
  * SIadv's defense wrapping (reference attack/SIadv/SIadv_attack.py:
    189-202 — classify defense(pre_head(x)) instead of x);
  * the 5-model transfer self-tests every CW-family attack runs
    (reference attack/KNN/KNN_attack.py:175-240,
    attack/GeoA3/GeoA3_attack.py:407-471);
  * the shuffled-points robustness check (attack/CW/CW_attack.py:227-241).
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def with_defense(
    model_fn: Callable,
    defense: str,
    *,
    key: jax.Array | None = None,
    npoint: int = 1024,
    srs_drop_num: int = 500,
    dup_variables: dict | None = None,
) -> Callable:
    """Wrap a model_fn with a pre-processing defense head.

    defense: "sor" | "srs" | "dupnet" (reference SIadv_attack.py:189-202).
    """
    from pointcloudattack_tpu.defense import DUPNet, sor_defense, srs_defense

    if defense == "sor":
        return lambda x: model_fn(sor_defense(x, k=2, alpha=1.1,
                                              npoint=x.shape[1]))
    if defense == "srs":
        if key is None:
            key = jax.random.PRNGKey(0)
        return lambda x: model_fn(
            srs_defense(x, key, drop_num=min(srs_drop_num, x.shape[1] // 2))
        )
    if defense == "dupnet":
        dup = DUPNet(npoint=npoint, up_ratio=4)
        if dup_variables is not None:
            variables = dup_variables
        else:
            variables = dup.init(
                key if key is not None else jax.random.PRNGKey(0)
            )
        return lambda x: model_fn(dup(variables, x))
    raise ValueError(f"unknown defense {defense!r}")


def transfer_matrix(
    model_fns: Mapping[str, Callable],
    adv: jax.Array,
    target: jax.Array,
    targeted: bool = False,
    devices=None,
) -> dict[str, float]:
    """Transfer ASR of adversarial clouds against a panel of victims.

    Returns {model_name: transfer success rate} — the batched equivalent
    of the per-sample fail counters the reference accumulates
    (pt_fail/ptm_fail/... in GeoA3_attack.py:208-212).

    devices: optional device list — panel member k runs on
    ``devices[k % len(devices)]`` (inputs are committed there once per
    device; each member's jitted forward follows its committed inputs),
    so a K-model panel evaluates CONCURRENTLY across K chips instead of
    serially on one.  The panel is heterogeneous (different
    architectures = different programs), so this is per-model placement
    — the mesh axis SPMD cannot express — and Pallas kernels stay
    enabled because every program remains single-device (the Mosaic
    GSPMD constraint never triggers).  With or without ``devices``, all
    host fetches are deferred until every member is enqueued: one sync
    at the end, not K serial ~25 ms tunnel round-trips.
    """
    oks: dict[str, jax.Array] = {}
    placed: dict = {}
    for k, (name, fn) in enumerate(model_fns.items()):
        if devices:
            d = devices[k % len(devices)]
            if d not in placed:
                placed[d] = (
                    jax.device_put(adv, d),
                    jax.device_put(target, d),
                )
            x, t = placed[d]
        else:
            x, t = adv, target
        pred = jnp.argmax(fn(x), axis=-1)
        oks[name] = pred == t if targeted else pred != t
    return {name: float(np.asarray(ok).mean()) for name, ok in oks.items()}


def shuffle_robustness(
    model_fn: Callable,
    adv: jax.Array,
    target: jax.Array,
    key: jax.Array,
    num_trials: int = 1,
    targeted: bool = False,
) -> float:
    """Fraction of clouds whose attack survives random point shuffling."""
    n = adv.shape[1]
    oks = []
    for i in range(num_trials):
        perm = jax.random.permutation(jax.random.fold_in(key, i), n)
        pred = jnp.argmax(model_fn(adv[:, perm, :]), axis=-1)
        ok = pred == target if targeted else pred != target
        oks.append(np.asarray(ok))
    return float(np.stack(oks).mean())
