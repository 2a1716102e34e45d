"""ISO: isometry (rotation) attacks — Thompson-sampling black box (TSI)
and gradient white box on a 3x3 linear transform (CTRI).

Behavioral twin of reference attack/ISO/:
  * ``ISOnet`` (iso_attack.py:89-101) becomes a plain function: the victim
    is evaluated on ``x @ W^T`` (torch nn.Linear(3,3) applies x W^T);
  * Thompson bandit over a d^3 grid of Euler-angle intervals
    (thompson_sample.py:22-81) — Beta posteriors live on the host (they
    are 512 floats; the model forwards stay jitted on device);
  * rotation/reflection interval samplers (isometry_init.py:4-92);
  * gradient attack (iso_attack.py:121-159): Adam on W, loss =
    -CE (untargeted) or clamped logit gap (targeted), plus
    LAMBDA * spectral penalty |v^T (W^T W - I) v| via power iteration
    (iso_attack.py:58-65) and the Schatten-p alternative (:68-73).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class ISOConfig:
    """Reference CLI defaults (iso_attack.py:253-267 argparse:
    step_size 5e-4, num_steps 50, LAMBDA 1000, num_init 50)."""

    step_size: float = 5e-4
    num_steps: int = 50
    lam: float = 1000.0  # LAMBDA penalty weight
    kappa: float = 0.0
    targeted: bool = False
    bandit_d: int = 4
    bandit_a0: float = -np.pi
    bandit_b0: float = np.pi
    num_init: int = 50
    power_iters: int = 30


def apply_iso(x: jax.Array, w: jax.Array) -> jax.Array:
    """nn.Linear(3,3,bias=False) on channels-last points: x @ W^T."""
    return jnp.einsum("bnc,dc->bnd", x, w)


def spectral_penalty(
    w: jax.Array, key: jax.Array, iters: int = 30
) -> jax.Array:
    """|v^T (W^T W - I) v| by power iteration (iso_attack.py:58-65)."""
    m = w.T @ w - jnp.eye(3, dtype=w.dtype)
    v0 = jax.random.normal(key, (3,), dtype=w.dtype)
    v0 = v0 / (jnp.linalg.norm(v0) + 1e-12)

    def body(v, _):
        v = m @ v
        v = v / (jnp.linalg.norm(v) + 1e-12)
        return v, None

    v, _ = jax.lax.scan(body, v0, None, length=iters)
    return jnp.abs(v @ (m @ v))


def iso_penalty(w: jax.Array, p: float = 2.0) -> jax.Array:
    """Schatten-p norm of W^T W - I (iso_attack.py:68-73)."""
    m = w.T @ w - jnp.eye(3, dtype=w.dtype)
    sigma = jnp.linalg.svd(m, compute_uv=False)
    return jnp.abs(jnp.sum(sigma**p) ** (1.0 / p))


def rotation_xyz(angles: np.ndarray) -> np.ndarray:
    """R_z R_y R_x from Euler angles (isometry_init.py:4-28)."""
    cx, sx = np.cos(angles[0]), np.sin(angles[0])
    cy, sy = np.cos(angles[1]), np.sin(angles[1])
    cz, sz = np.cos(angles[2]), np.sin(angles[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, sz, 0], [-sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def reflection(angles: np.ndarray) -> np.ndarray:
    """I - 2 u u^T householder reflection (isometry_init.py:65-76)."""
    c1, s1 = np.cos(angles[0]), np.sin(angles[0])
    c2, s2 = np.cos(angles[1]), np.sin(angles[1])
    u = np.array([[s1, c1 * s2, c1 * c2]])
    return np.identity(3) - 2.0 * (u.T @ u)


class BernThompson:
    """Beta-Bernoulli Thompson sampler over a d^3 Euler-angle grid.

    Host-side twin of reference thompson_sample.py:56-81.
    """

    def __init__(self, d: int, a0: float, b0: float, seed: int = 0):
        self.d, self.a0, self.b0 = d, a0, b0
        self.alpha = np.ones((d, d, d))
        self.beta = np.ones((d, d, d))
        self.rng = np.random.RandomState(seed)

    def get_action(self):
        theta = self.rng.beta(self.alpha, self.beta)
        return np.unravel_index(np.argmax(theta), theta.shape)

    def sample_matrix(self, arm, kind: str = "rotation") -> np.ndarray:
        lo = self.a0 + (self.b0 - self.a0) * np.asarray(arm) / self.d
        hi = self.a0 + (self.b0 - self.a0) * (np.asarray(arm) + 1) / self.d
        angles = self.rng.uniform(lo, hi)
        if kind == "reflection":
            return reflection(angles)
        return rotation_xyz(angles)

    def update(self, arm, reward: int):
        self.alpha[arm] += reward
        self.beta[arm] += 1 - reward


def build_tsi_probe(model_fn: Callable):
    """One jitted (obj, label, w) -> (pred, true_prob) probe.

    Build this ONCE and pass it to ``thompson_sample_attack`` when
    attacking many samples — a probe closure rebuilt per sample would
    re-trace and re-compile the victim forward every time (minutes on
    the axon remote-compile tunnel).
    """

    @jax.jit
    def probe(obj, label, w):
        logits = model_fn(apply_iso(obj, w))
        prob = jax.nn.softmax(logits, axis=-1)
        pred = jnp.argmax(logits, axis=-1)
        true_prob = jnp.take_along_axis(prob, label[:, None], axis=-1)[:, 0]
        return pred, true_prob

    return probe


def thompson_sample_attack(
    model_fn: Callable | None,
    bandit: BernThompson,
    obj: jax.Array,
    label: jax.Array,
    num_init: int = 10,
    kind: str = "rotation",
    probe: Callable | None = None,
):
    """TSI attack: propose random isometries until one misclassifies.

    Returns (best W [3,3], success, tries). The W with the lowest true-
    class probability is kept (iso_attack.py:104-118).  ``probe`` is an
    optional pre-built ``build_tsi_probe(model_fn)`` result; pass it
    (with ``model_fn=None``) when calling in a loop so the victim
    forward compiles once — exactly one of the two must be given, so a
    probe built from a different model can't silently shadow model_fn.
    """
    if (probe is None) == (model_fn is None):
        raise ValueError("pass exactly one of model_fn or probe")
    if probe is None:
        probe = build_tsi_probe(model_fn)

    best_w, best_prob = None, np.inf
    for i in range(num_init):
        arm = bandit.get_action()
        w = jnp.asarray(bandit.sample_matrix(arm, kind), dtype=obj.dtype)
        pred, true_prob = probe(obj, label, w)
        wrong = bool((np.asarray(pred) != np.asarray(label)).all())
        bandit.update(arm, int(wrong))
        tp = float(np.asarray(true_prob).mean())
        if tp < best_prob:
            best_prob, best_w = tp, w
        if wrong:
            return best_w, True, i + 1
    return best_w, False, num_init


def _tsi_probe_batched_math(model_fn, objs, labels, ws):
    """(objs [B,N,3], labels [B], ws [B,3,3]) -> (pred, true_prob):
    per-sample isometries in ONE victim forward.  Shared by the jitted
    standalone probe below and the lockstep round body (one copy of the
    probe semantics)."""
    logits = model_fn(jnp.einsum("bnc,bdc->bnd", objs, ws))
    prob = jax.nn.softmax(logits, axis=-1)
    pred = jnp.argmax(logits, axis=-1)
    true_prob = jnp.take_along_axis(
        prob, labels[:, None], axis=-1
    )[:, 0]
    return pred, true_prob


def build_tsi_probe_batched(model_fn: Callable):
    """Jitted (objs [B,N,3], labels [B], ws [B,3,3]) -> (pred, true_prob).

    Per-sample isometries in ONE victim forward — the lockstep TSI
    probe (each sample carries its own candidate W).
    """

    @jax.jit
    def probe(objs, labels, ws):
        return _tsi_probe_batched_math(model_fn, objs, labels, ws)

    return probe


def _rotation_xyz_jnp(angles: jax.Array) -> jax.Array:
    """Batched R_z R_y R_x ([..., 3] -> [..., 3, 3]), the jnp twin of
    ``rotation_xyz`` (reference isometry_init.py:4-28)."""
    cx, sx = jnp.cos(angles[..., 0]), jnp.sin(angles[..., 0])
    cy, sy = jnp.cos(angles[..., 1]), jnp.sin(angles[..., 1])
    cz, sz = jnp.cos(angles[..., 2]), jnp.sin(angles[..., 2])
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)

    def mat(rows):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )

    rx = mat([[one, zero, zero], [zero, cx, -sx], [zero, sx, cx]])
    ry = mat([[cy, zero, sy], [zero, one, zero], [-sy, zero, cy]])
    rz = mat([[cz, sz, zero], [-sz, cz, zero], [zero, zero, one]])
    return rz @ ry @ rx


def _reflection_jnp(angles: jax.Array) -> jax.Array:
    """Batched Householder I - 2uu^T ([..., >=2] -> [..., 3, 3]),
    jnp twin of ``reflection`` (reference isometry_init.py:65-76)."""
    c1, s1 = jnp.cos(angles[..., 0]), jnp.sin(angles[..., 0])
    c2, s2 = jnp.cos(angles[..., 1]), jnp.sin(angles[..., 1])
    u = jnp.stack([s1, c1 * s2, c1 * c2], axis=-1)  # [..., 3]
    eye = jnp.eye(3, dtype=angles.dtype)
    return eye - 2.0 * u[..., :, None] * u[..., None, :]


def thompson_sample_attack_lockstep(
    bandit: BernThompson,
    objs: jax.Array,
    labels: jax.Array,
    num_init: int = 10,
    kind: str = "rotation",
    model_fn: Callable | None = None,
    key: jax.Array | None = None,
):
    """Device-resident batched-Thompson TSI over a whole batch at once.

    DEVIATION from reference iso_attack.py:104-118 (opt-in, CLI
    ``--iso_lockstep``): the reference runs ONE bandit strictly
    sequentially on the host — sample i+1's posterior has seen every
    probe of sample i, and angles come from numpy RNG.  Here the ENTIRE
    bandit lives inside one ``lax.while_loop``: each round draws an
    independent Thompson arm per sample from the CURRENT Beta posterior
    (``jax.random.beta``), builds all candidate isometries in-graph,
    probes the whole batch in one victim forward, and applies all
    rewards — standard batched Thompson sampling, ONE device dispatch
    for the whole TSI phase instead of one host round-trip per probe
    per sample.  The reward rule, Beta posterior family, per-sample
    best-W rule (lowest true-class probability, iso_attack.py:109-114)
    and per-sample probe budget are unchanged; the posterior update
    ORDER and the RNG stream differ.

    The ``bandit`` provides (d, a0, b0) and its posterior is read as
    the initial state and written back after the run, so interleaving
    with sequential calls composes.

    Returns (ws [B,3,3] jnp, success [B] bool np, tries [B] int np).
    """
    if model_fn is None:
        raise ValueError("model_fn is required")
    if key is None:
        key = jax.random.PRNGKey(bandit.rng.randint(0, 2**31 - 1))
    b = int(objs.shape[0])
    d = bandit.d
    span = bandit.b0 - bandit.a0

    def round_body(state):
        (alpha, beta, best_w, best_prob, success, tries, i, k) = state
        k, k_theta, k_ang = jax.random.split(k, 3)
        theta = jax.random.beta(
            k_theta, alpha[None], beta[None], shape=(b, d, d, d)
        )
        flat_arm = jnp.argmax(theta.reshape(b, -1), axis=-1)  # [B]
        arm = jnp.stack(
            jnp.unravel_index(flat_arm, (d, d, d)), axis=-1
        ).astype(objs.dtype)  # [B, 3]
        lo = bandit.a0 + span * arm / d
        hi = bandit.a0 + span * (arm + 1.0) / d
        angles = jax.random.uniform(
            k_ang, (b, 3), dtype=objs.dtype, minval=lo, maxval=hi
        )
        ws = (
            _reflection_jnp(angles)
            if kind == "reflection"
            else _rotation_xyz_jnp(angles)
        )
        pred, true_prob = _tsi_probe_batched_math(
            model_fn, objs, labels, ws
        )
        wrong = pred != labels
        active = ~success
        # masked posterior update: finished samples stop rewarding
        onehot = jax.nn.one_hot(flat_arm, d * d * d, dtype=alpha.dtype)
        w_f = wrong.astype(alpha.dtype) * active.astype(alpha.dtype)
        a_f = active.astype(alpha.dtype)
        alpha = alpha + (onehot * w_f[:, None]).sum(0).reshape(d, d, d)
        beta = beta + (onehot * (a_f - w_f)[:, None]).sum(0).reshape(
            d, d, d
        )
        better = active & (true_prob < best_prob)
        best_prob = jnp.where(better, true_prob, best_prob)
        best_w = jnp.where(better[:, None, None], ws, best_w)
        newly = active & wrong
        tries = jnp.where(newly, i + 1, tries)
        success = success | newly
        return (alpha, beta, best_w, best_prob, success, tries, i + 1, k)

    def cond(state):
        success, i = state[4], state[6]
        return jnp.logical_and(i < num_init, ~jnp.all(success))

    init = (
        jnp.asarray(bandit.alpha, dtype=jnp.float32),
        jnp.asarray(bandit.beta, dtype=jnp.float32),
        jnp.broadcast_to(jnp.eye(3, dtype=objs.dtype), (b, 3, 3)),
        jnp.full((b,), jnp.inf, dtype=objs.dtype),
        jnp.zeros((b,), dtype=bool),
        jnp.full((b,), num_init, dtype=jnp.int32),
        jnp.int32(0),
        key,
    )
    alpha, beta, best_w, _, success, tries, _, _ = jax.jit(
        lambda s: jax.lax.while_loop(cond, round_body, s)
    )(init)
    bandit.alpha = np.asarray(alpha, dtype=np.float64)
    bandit.beta = np.asarray(beta, dtype=np.float64)
    return best_w, np.asarray(success), np.asarray(tries)


def build_gradient_iso_attack(
    model_fn: Callable, cfg: ISOConfig, batched: bool = False
):
    """CTRI attack: Adam on the 3x3 matrix with spectral-norm penalty.

    Compiled (obj [B,N,3], label [B], w0 [3,3], key) ->
    (w [3,3], success [B], penalty, steps).

    batched=True vmaps the whole loop over a leading per-sample axis:
    (objs [K,1,N,3], labels [K,1], w0s [K,3,3], keys [K]) ->
    (ws [K,3,3], success [K,1], penalties [K], steps [K]) — one
    executable, per-sample Adam state / early stop / RNG.  Under vmap a
    finished lane's carry is select-masked, so every lane's trajectory
    (and its returned w/steps/penalty) matches a solo B=1 run with the
    same key up to batched-matmul rounding (~1e-7; step counts and
    success exactly — tests/test_attack_families2.py::
    test_ctri_batched_matches_sequential); wall time is the max step
    count across lanes instead of the sum.
    """
    opt = optax.adam(cfg.step_size)

    def run(obj, label, w0, key):
        def loss_fn(w, k):
            logits = model_fn(apply_iso(obj, w))
            if cfg.targeted:
                one_hot = jax.nn.one_hot(
                    label, logits.shape[-1], dtype=logits.dtype
                )
                real = jnp.sum(one_hot * logits, axis=-1)
                other = jnp.max(logits - one_hot * 1e9, axis=-1)
                loss1 = jnp.sum(jnp.maximum(real - other, -cfg.kappa))
            else:
                # maximize CE of the true label
                logp = jax.nn.log_softmax(logits, axis=-1)
                one_hot = jax.nn.one_hot(
                    label, logits.shape[-1], dtype=logits.dtype
                )
                loss1 = jnp.sum(jnp.sum(one_hot * logp, axis=-1))
            # NOTE: the reference computes the penalty on weight.data
            # (iso_attack.py:146) — it contributes NO gradient to W; the
            # stop_gradient reproduces that and avoids differentiating
            # through the power iteration's near-zero normalizations.
            pen = jax.lax.stop_gradient(
                spectral_penalty(w, k, cfg.power_iters)
            )
            return loss1 + cfg.lam * pen, pen

        def cond(state):
            w, opt_state, step, done, pen = state
            return jnp.logical_and(step < cfg.num_steps, ~done)

        def body(state):
            w, opt_state, step, done, _ = state
            k = jax.random.fold_in(key, step)
            (loss, pen), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                w, k
            )
            updates, opt_state = opt.update(grads, opt_state, w)
            w = optax.apply_updates(w, updates)
            pred = jnp.argmax(model_fn(apply_iso(obj, w)), axis=-1)
            done = jnp.all(pred != label)
            return (w, opt_state, step + 1, done, pen)

        init = (
            w0,
            opt.init(w0),
            jnp.int32(0),
            jnp.bool_(False),
            jnp.float32(0.0),
        )
        w, _, steps, done, pen = jax.lax.while_loop(cond, body, init)
        pred = jnp.argmax(model_fn(apply_iso(obj, w)), axis=-1)
        return w, pred != label, pen, steps

    if batched:
        return jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0)))
    return jax.jit(run)
