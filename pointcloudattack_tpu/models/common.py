"""Shared model building blocks.

Conventions (framework-wide):
  * inputs are channels-last ``[B, N, 3]`` clouds — every per-point MLP is
    then a plain ``[B*N, C] @ [C, C']`` matmul that XLA tiles onto the MXU
    (the reference's 1x1 Conv1d/Conv2d layers are exactly this, transposed);
  * BatchNorm follows torch defaults (eps=1e-5, momentum 0.1 torch == 0.9
    flax convention) so ported reference checkpoints reproduce activations;
  * models return ``(log_probs, aux)`` where ``aux`` carries the spatial /
    feature transform matrices the reference returns as a 3-tuple
    (reference model/pointnet.py:143-148).
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
    mlp_chain_maxpool,
    use_chain_kernel,
)

def _env_tri(name: str):
    """Tri-state env knob: unset/'' -> None (per-family policy),
    '0' -> False (force off everywhere), anything else -> True (force
    on everywhere)."""
    v = os.environ.get(name)
    return None if v in (None, "") else v != "0"


# Master dispatch switches for the fused Pallas kernels
# (ops/pallas/dense_max_kernel.py chain+pool,
# ops/pallas/gather_chain_kernel.py in-kernel gather).  Each of
# "enabled"/"gather" is tri-state: True/False FORCE the tier on/off for
# every family (tests, A/B arms, kill switches), None defers to the
# measured per-family FUSED_POLICY below.  "interpret" is a test hook
# that runs the kernels through the Pallas interpreter on CPU.
FUSED_MAXPOOL = {
    "enabled": _env_tri("PCA_FUSED_MAXPOOL"),
    "gather": _env_tri("PCA_FUSED_GATHER"),
    # in-kernel ball query riding on the gather kernel
    # (ops/pallas/gather_chain_kernel.py::ball_gather_chain_groupmax)
    "ballq": _env_tri("PCA_FUSED_BALLQ"),
    # scatter-free gather VJP (ops/gather.py::index_points_mm_bwd) for
    # a family's differentiated neighbour gathers — a BACKWARD-only
    # tier, orthogonal to the forward chain/gather kernels
    "mm_bwd": _env_tri("PCA_MM_GATHER_BWD"),
    "interpret": False,
    # set by retry_without_fused_maxpool when a hardware rejection flips
    # a tier off mid-process — bench.py records it per family
    "disabled_reason": "",
}

# Measured per-victim fused-kernel defaults (TPU v5e A/B,
# scripts/bench_fused_maxpool.py — decision data in BENCH.md round 4).
# "chain": the fused MLP-chain+pool kernels; "gather": the in-kernel
# neighbour gather riding on top (its kernel subsumes the chain, so the
# two tiers are independent knobs).  f32 numbers drove these defaults;
# under bf16 activations XLA's own fusion measured FASTER than the
# chain kernel on the headline (round 3: 250.9 unfused vs 187.9 fused
# clouds/s), so bf16 defaults to unfused unless a family's
# "chain_bf16"/"gather_bf16" says otherwise.  PCA_FUSED_MAXPOOL /
# PCA_FUSED_GATHER =0/1 force-override everything.
FUSED_POLICY: dict = {
    "pointnet": {"chain": True, "chain_bf16": False},
    # "ballq": in-kernel ball query on top of the gather fusion — the
    # [B, S, N, K] slot one-hot (SSG's measured forward bound, ~0.5
    # GB/iter: BENCH.md anatomy, round-5 verdict task 3) never exists.
    # Measured NEGATIVE on v5e (cw_ssg 17.0 -> 11.0, cw_msg 4.4 -> 2.6
    # clouds/s, scripts/bench_ballq_ab.py): the membership + slot scan
    # is recomputed per grid block on the VPU in BOTH kernel directions,
    # which costs more than the one-time HBM one-hot it replaces —
    # BENCH.md round-5 ledger.  Tier stays available via PCA_FUSED_BALLQ
    # (hardware-bitwise-verified: results_fused_parity_v5e.json +ballq).
    "ssg": {"chain": True, "gather": True, "ballq": False},
    "msg": {"chain": True, "gather": True, "ballq": False},
    "dgcnn": {"chain": False, "gather": False},
    # CurveNet: pure XLA WINS (careful 3-arm A/B, B=8x100, 4 post-warmup
    # reps each: off 22.71 ms/iter = 3.52 clouds/s, chain 29.18 = 2.74,
    # chain+gather 23.86 = 3.35).  The earlier off-arm reading of 0.1
    # clouds/s was contaminated by the axon server's first-execution
    # program load landing inside the timed reps.  Both tiers stay
    # available via the PCA_FUSED_* force flags.
    # "mm_bwd": the round-5 anatomy (BENCH.md) pinned the CurveNet CW
    # iteration on the model VJP (23.1 of 22.7 ms/iter; forward only
    # 6.1) — the differentiated neighbour gathers' scatter-add
    # backwards.  index_points_mm_bwd replaces them with one-hot
    # transpose matmuls (the same trade GeoA3 measured 4.9x on in
    # round 3); measured v5e A/B in BENCH.md round 5.
    "curvenet": {"chain": False, "gather": False, "mm_bwd": True},
    "punet": {"chain": True, "gather": False},
}


def fused_chain_on(family: str = "", dtype=None) -> bool:
    """Should the fused chain+pool kernels dispatch for ``family`` with
    activations of ``dtype``?  Force flags first, then FUSED_POLICY."""
    v = FUSED_MAXPOOL["enabled"]
    if v is not None:
        return bool(v)
    pol = FUSED_POLICY.get(family, {})
    if dtype is not None and jnp.dtype(dtype) == jnp.bfloat16:
        return bool(pol.get("chain_bf16", False))
    return bool(pol.get("chain", True))


def fused_gather_on(family: str = "", dtype=None) -> bool:
    """Should the in-kernel gather fusion dispatch?  Independent of the
    chain tier (the gather kernel replaces the chain it rides on), but
    the master "enabled" False kill switch turns EVERYTHING off."""
    if FUSED_MAXPOOL["enabled"] is False:
        return False
    v = FUSED_MAXPOOL["gather"]
    if v is not None:
        return bool(v)
    pol = FUSED_POLICY.get(family, {})
    if dtype is not None and jnp.dtype(dtype) == jnp.bfloat16:
        return bool(pol.get("gather_bf16", False))
    return bool(pol.get("gather", False))


def fused_ballq_on(family: str = "", dtype=None) -> bool:
    """Should the in-kernel BALL QUERY variant of the gather kernel
    dispatch?  Requires the gather tier to be live for the family (the
    ball kernel subsumes gather+chain, so a family that measured
    gather-off keeps ballq off too); master "enabled" False kills it.
    PCA_FUSED_BALLQ=0/1 force-overrides the per-family policy (the
    forced-on case still needs the gather tier on — use both flags)."""
    if not fused_gather_on(family, dtype):
        return False
    v = FUSED_MAXPOOL["ballq"]
    if v is not None:
        return bool(v)
    pol = FUSED_POLICY.get(family, {})
    if dtype is not None and jnp.dtype(dtype) == jnp.bfloat16:
        return bool(pol.get("ballq_bf16", False))
    return bool(pol.get("ballq", False))


def mm_gather_on(family: str = "") -> bool:
    """Should ``family``'s differentiated neighbour gathers use the
    scatter-free one-hot MXU VJP (ops/gather.py::index_points_mm_bwd)
    instead of XLA's scatter-add?  Backward-only: forwards are bitwise
    identical either way (both are the flat row lookup); the VJP
    deviation is f32 matmul reduction order.  PCA_MM_GATHER_BWD=0/1
    force-overrides the per-family policy."""
    v = FUSED_MAXPOOL["mm_bwd"]
    if v is not None:
        return bool(v)
    return bool(FUSED_POLICY.get(family, {}).get("mm_bwd", False))


def fused_state() -> str:
    """One-line provenance string for bench records: the force flags
    (or 'policy' when deferring to FUSED_POLICY)."""

    def s(v):
        return "policy" if v is None else ("on" if v else "off")

    return (
        f"chain={s(FUSED_MAXPOOL['enabled'])} "
        f"gather={s(FUSED_MAXPOOL['gather'])}"
    )


def is_mosaic_error(e: BaseException) -> bool:
    """True when an exception looks like a Mosaic/Pallas kernel failure
    (shape rejection, lowering gap, TPU custom-call compile/runtime
    error) rather than an unrelated attack/runtime failure.  Mosaic
    rejections surface as XlaRuntimeError/NotImplementedError messages
    naming Mosaic, Pallas, or the tpu_custom_call target."""
    msg = f"{type(e).__name__}: {e}".lower()
    return any(s in msg for s in ("mosaic", "pallas", "tpu_custom_call"))


def retry_without_fused_maxpool(run, on_disable=None):
    """Call ``run()``; on a Mosaic/Pallas failure, de-escalate the
    fused-kernel knobs one at a time — first the OPT-IN gather fusion
    ("gather", hardware-untested until its A/B lands), then the
    default-on chain+pool kernels ("enabled") — dropping every cached
    jitted trace between retries (compiled programs have the kernels
    baked in).  Flipping "enabled" first would throw away the
    measured-good chain kernels when only the experimental gather
    kernel was rejected.

    Mosaic kernel-shape acceptance is per-shape and only observable on
    real TPU hardware, so the dispatch gates
    (dense_max_kernel.use_chain_kernel/use_group_chain_kernel) cannot
    fully pre-validate; PCA_FUSED_MAXPOOL=0 / PCA_FUSED_GATHER=0 are
    the manual kill switches.  Unrelated failures (OOM, bad checkpoint
    path, tunnel drops) are NOT swallowed — they re-raise immediately
    instead of triggering a full re-run on the slow path with a
    misattributed cause.  Set PCA_FUSED_FALLBACK_ANY=1 to restore
    catch-everything insurance.

    ``on_disable`` runs after each flag flip (callers clear their own
    builder memos there).
    """
    broad = os.environ.get("PCA_FUSED_FALLBACK_ANY", "0") == "1"
    while True:
        try:
            return run()
        except Exception as e:
            if not (broad or is_mosaic_error(e)):
                raise
            # tri-state knobs: None (policy — possibly on for some
            # families) counts as "still on" for de-escalation; forcing
            # to False turns the tier off everywhere
            if FUSED_MAXPOOL["ballq"] is not False:
                knob, label = "ballq", "in-kernel ball-query fusion"
            elif FUSED_MAXPOOL["gather"] is not False:
                knob, label = "gather", "in-kernel gather fusion"
            elif FUSED_MAXPOOL["enabled"] is not False:
                knob, label = "enabled", "fused chain+pool kernels"
            else:
                raise  # every tier already off: a genuine failure
            FUSED_MAXPOOL[knob] = False
            FUSED_MAXPOOL["disabled_reason"] = str(e)[:160]
            jax.clear_caches()
            if on_disable is not None:
                on_disable()
            print(
                f"{label} disabled after {type(e).__name__}; "
                f"retrying ({str(e)[:120]})",
                flush=True,
            )


class PointMLP(nn.Module):
    """Stack of per-point Dense+BN+ReLU layers (= reference 1x1 convs).

    Operates on the last axis of any ``[..., C]`` input.

    pool_max=True additionally max-pools the LAST layer's output over
    the point axis (axis 1) and returns ``[B, C]`` — on TPU in eval mode
    that last Dense+BN+max runs as one fused Pallas pass that never
    materializes the [B, N, C] map (the measured HBM bottleneck of
    PointNet-victim attacks, see ops/pallas/dense_max_kernel.py).  ReLU
    (when ``relu_last``) is applied after the pool — bit-identical, max
    and relu commute.
    """

    features: Sequence[int]
    relu_last: bool = True
    pool_max: bool = False
    # owning model family for the per-victim fused-kernel policy
    # (FUSED_POLICY); "" falls through to the policy default (chain on)
    family: str = ""

    def _fused_layer(self, i: int):
        """(w, b, mean, mul, beta) of layer i for mlp_chain_maxpool.

        flax BatchNorm's eval math is (x - mean) * mul + bias with
        mul = rsqrt(var + eps) * scale — same op order here.
        """
        pd = self.get_variable("params", f"dense{i}")
        pb = self.get_variable("params", f"bn{i}")
        st = self.get_variable("batch_stats", f"bn{i}")
        mul = jax.lax.rsqrt(st["var"] + 1e-5) * pb["scale"]
        return (pd["kernel"], pd["bias"], st["mean"], mul, pb["bias"])

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = len(self.features)
        fusable = (
            self.pool_max
            and not train
            and not self.is_initializing()
            and x.ndim == 3
            and fused_chain_on(self.family, x.dtype)
        )
        ip = FUSED_MAXPOOL["interpret"]
        # whole-stack fusion: every layer + the max pool in ONE Pallas
        # pass — no [B, N, C] map of ANY layer touches HBM (intermediate
        # ReLUs run inside the kernel; a trailing relu_last commutes
        # with the max and is applied to the pooled output below)
        if fusable and (
            ip or use_chain_kernel(x.shape[1], (x.shape[-1], *self.features))
        ):
            layers = tuple(self._fused_layer(i) for i in range(n))
            x = mlp_chain_maxpool(x, layers, ip).astype(x.dtype)
            return nn.relu(x) if self.relu_last else x

        for i, f in enumerate(self.features):
            last = i == n - 1
            # tail-only fusion fallback (full chain ineligible)
            if last and fusable and (
                ip or use_chain_kernel(x.shape[1], (x.shape[-1], f))
            ):
                x = mlp_chain_maxpool(
                    x, (self._fused_layer(i),), ip
                ).astype(x.dtype)
            else:
                x = nn.Dense(f, name=f"dense{i}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"bn{i}",
                )(x)
                if last and self.pool_max:
                    x = jnp.max(x, axis=1)
            if self.relu_last or not last:
                x = nn.relu(x)
        return x


def max_pool_points(x: jax.Array) -> jax.Array:
    """Global max over the point axis: [B, N, C] -> [B, C]."""
    return jnp.max(x, axis=1)


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """|| T T^t - I ||_F penalty, mean over batch.

    Reference model/pointnet.py:179-186.
    """
    d = trans.shape[-1]
    eye = jnp.eye(d, dtype=trans.dtype)
    ttt = jnp.einsum(
        "bij,bkj->bik", trans, trans, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.mean(jnp.linalg.norm(ttt - eye[None], axis=(1, 2)))
