"""Dynamic Graph CNN classifier.

TPU-native re-design of reference model/dgcnn.py:262-328: four EdgeConv
stages, each rebuilding a kNN graph in feature space; edge features
``[x_j - x_i, x_i]`` go through a per-edge MLP (MXU matmul over the
[B, N, k, 2C] tensor) and max over neighbours.  Global max+avg pooled
embeddings feed the LeakyReLU(0.2) FC head; output is log-softmax.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.ops.gather import index_points
from pointcloudattack_tpu.ops.knn import knn


def graph_feature(
    x: jax.Array, k: int, gather_mode: str = "exact"
) -> jax.Array:
    """Edge features of the kNN graph: [B, N, k, 2C].

    Reference model/dgcnn.py:203-227 (concat of [neighbour - center,
    center]).

    gather_mode picks how neighbour features are gathered (the gather is
    ~6 ms/stage at [32, 1024, 20] on v5e — the dominant EdgeConv cost
    after the Pallas kNN kernel):
      * "exact": XLA gather, bitwise-faithful (default);
      * "hilo": one-hot MXU matmul with the features split into two
        bf16 limbs (hi = bf16(x), lo = bf16(x - hi)) — ~2x faster,
        max observed error 3e-5 on unit-scale clouds;
      * "bf16": single-limb one-hot matmul (round-1 fast_gather) —
        fastest, rounds features to bf16 (~4e-3 relative).
    """
    idx = knn(x, k)  # [B, N, k], self included as in the reference
    if gather_mode in ("hilo", "bf16"):
        n = x.shape[1]
        onehot = jax.nn.one_hot(idx, n, dtype=jnp.bfloat16)
        hi = x.astype(jnp.bfloat16)
        nbr = jnp.einsum(
            "bnkm,bmc->bnkc",
            onehot,
            hi,
            preferred_element_type=jnp.float32,
        )
        if gather_mode == "hilo":
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            nbr = nbr + jnp.einsum(
                "bnkm,bmc->bnkc",
                onehot,
                lo,
                preferred_element_type=jnp.float32,
            )
    elif gather_mode == "exact":
        nbr = index_points(x, idx)  # [B, N, k, C]
    else:
        raise ValueError(f"unknown gather_mode {gather_mode!r}")
    ctr = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


class EdgeConv(nn.Module):
    """kNN graph -> per-edge Dense+BN+LeakyReLU -> max over neighbours."""

    features: int
    k: int
    gather_mode: str = "exact"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        e = graph_feature(x, self.k, self.gather_mode)  # [B, N, k, 2C]
        h = nn.Dense(self.features, use_bias=False)(e)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return jnp.max(h, axis=2)  # [B, N, features]


class DGCNN(nn.Module):
    """DGCNN classifier. Returns (log_probs, aux).

    Defaults follow the reference CLI flags: k=20, emb_dims=1024,
    dropout=0.5 (reference train.py:53-57).
    """

    num_classes: int = 40
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    gather_mode: str = "exact"  # "exact" | "hilo" | "bf16" (graph_feature)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        # x: [B, N, 3]
        gm = self.gather_mode
        x1 = EdgeConv(64, self.k, gm, name="conv1")(x, train=train)
        x2 = EdgeConv(64, self.k, gm, name="conv2")(x1, train=train)
        x3 = EdgeConv(128, self.k, gm, name="conv3")(x2, train=train)
        x4 = EdgeConv(256, self.k, gm, name="conv4")(x3, train=train)
        cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 512]

        h = nn.Dense(self.emb_dims, use_bias=False, name="conv5")(cat)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn5",
        )(h)
        h = nn.leaky_relu(h, negative_slope=0.2)  # [B, N, emb]

        gmax = jnp.max(h, axis=1)
        gavg = jnp.mean(h, axis=1)
        g = jnp.concatenate([gmax, gavg], axis=-1)  # [B, 2*emb]

        g = nn.Dense(512, use_bias=False, name="linear1")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn6",
        )(g)
        g = nn.leaky_relu(g, negative_slope=0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        g = nn.Dense(256, name="linear2")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn7",
        )(g)
        g = nn.leaky_relu(g, negative_slope=0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        logits = nn.Dense(self.num_classes, name="linear3")(g)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, {}
