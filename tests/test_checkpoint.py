"""Orbax checkpoint round-trip."""

import numpy as np
import jax

from pointcloudattack_tpu import models
from pointcloudattack_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


def test_roundtrip(tmp_path):
    model = models.make_model("PointNet", 4)
    variables = models.init_model(model, jax.random.PRNGKey(0), 32, 1)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, variables)
    restored = restore_checkpoint(path, like=variables)
    for (pa, a), (pb, bv) in zip(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bv))
