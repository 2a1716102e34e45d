"""DUP-Net defense: SOR denoising followed by PU-Net upsampling.

Behavioral twin of reference
attack/SIadv/baselines/defense/DUP_Net/DUP_Net.py:14-34 (sor_k=2,
sor_alpha=1.1, npoint=1024, up_ratio=4).  The reference hard-loads its
trained upsampler from ``pu-in_1024-up_4.pth`` (shipped in the reference
checkout); load it here via ``train.torch_port.port_punet`` — numeric
parity with the real checkpoint is asserted in
tests/test_reference_parity2.py::TestDUPNetShippedWeights — or init
fresh weights / restore a checkpoint like any other model.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pointcloudattack_tpu.defense.sor import sor_defense
from pointcloudattack_tpu.models.punet import PUNet


@dataclasses.dataclass
class DUPNet:
    sor_k: int = 2
    sor_alpha: float = 1.1
    npoint: int = 1024
    up_ratio: int = 4

    def __post_init__(self):
        self.punet = PUNet(npoint=self.npoint, up_ratio=self.up_ratio)

    def init(self, key: jax.Array) -> dict:
        dummy = jnp.zeros((1, self.npoint, 3), dtype=jnp.float32)
        return self.punet.init(key, dummy)

    def __call__(self, variables: dict, pc: jax.Array) -> jax.Array:
        """[B, N, 3] -> [B, npoint * up_ratio, 3]."""
        x = sor_defense(
            pc, k=self.sor_k, alpha=self.sor_alpha, npoint=self.npoint
        )
        return self.punet.apply(variables, x)
