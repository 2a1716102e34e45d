"""PU-Net training recipe (denoising upsampler for the DUP-Net defense).

The reference ships DUP-Net with pre-trained weights
(``pu-in_1024-up_4.pth``, DUP_Net.py:24-28) but no training code.  Users
with that checkpoint load it through train.torch_port.port_punet; this
module provides the complement — a self-contained recipe that fits PU-Net
as a denoising upsampler so the defense can be exercised with TRAINED
weights (tests/test_defense.py), and so users without the original
checkpoint can produce one: the model maps a noisy ``npoint`` cloud to an
``npoint * up_ratio`` cloud and is fit with a symmetric Chamfer loss
against the clean dense cloud (the PU-Net paper's reconstruction term;
the EMD/repulsion extras are not needed at these scales).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from pointcloudattack_tpu.losses.distance import chamfer_both


@dataclasses.dataclass(frozen=True)
class PUNetTrainConfig:
    steps: int = 200
    batch_size: int = 8
    lr: float = 1e-3
    noise_sigma: float = 0.03  # input jitter during training


def make_punet_train_step(punet, cfg: PUNetTrainConfig):
    opt = optax.adam(cfg.lr)

    def loss_fn(params, noisy, dense):
        pred = punet.apply({"params": params}, noisy)
        a2o, o2a = chamfer_both(pred, dense)
        return jnp.mean(a2o + o2a)

    @jax.jit
    def step(params, opt_state, noisy, dense):
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, dense)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, opt


def train_punet(
    punet,
    variables: dict,
    cfg: PUNetTrainConfig,
    inputs,
    targets,
    key: jax.Array,
):
    """Fit PU-Net: noisy [M, npoint, 3] -> clean dense [M, npoint*r, 3].

    Returns (variables, final_loss).
    """
    inputs = jnp.asarray(inputs, dtype=jnp.float32)
    targets = jnp.asarray(targets, dtype=jnp.float32)
    m = inputs.shape[0]
    params = variables["params"]
    step, opt = make_punet_train_step(punet, cfg)
    opt_state = opt.init(params)
    loss = jnp.inf
    for i in range(cfg.steps):
        key, k_idx, k_noise = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (cfg.batch_size,), 0, m)
        noisy = inputs[idx] + (
            jax.random.normal(k_noise, (cfg.batch_size,) + inputs.shape[1:])
            * cfg.noise_sigma
        )
        params, opt_state, loss = step(params, opt_state, noisy,
                                       targets[idx])
    return {"params": params}, float(loss)
