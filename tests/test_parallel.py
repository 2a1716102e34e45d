"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu.parallel import mesh as pmesh
from pointcloudattack_tpu.parallel.driver import (
    run_sharded_attack,
    sharded_accuracy,
)
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.utils.apply import make_model_fn


def test_mesh_has_8_devices():
    m = pmesh.make_mesh()
    assert m.devices.size == 8


def test_shard_batch_layout():
    m = pmesh.make_mesh()
    x = jnp.zeros((16, 4, 3))
    xs = pmesh.shard_batch(m, x)
    assert xs.sharding.is_fully_addressable
    # each device holds 16/8 = 2 examples
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 4, 3)


def test_pad_to_multiple():
    arrs, n = pmesh.pad_to_multiple(
        [np.zeros((5, 3)), np.zeros((5,))], multiple=4
    )
    assert arrs[0].shape == (8, 3)
    assert n == 5


def test_sharded_attack_matches_single_device(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(binary_step=1, num_iter=30, kappa=0.0, budget=0.45)
    attack = build_cw_attack(model_fn, cfg)

    data = clouds[:8].astype(np.float32)
    target = labels[:8].astype(np.int64)
    key = jax.random.PRNGKey(5)

    res_single = attack(jnp.asarray(data), jnp.asarray(target), key)
    res_sharded = run_sharded_attack(attack, data, target, key)

    # same computation, same key -> same results regardless of sharding
    np.testing.assert_allclose(
        np.asarray(res_single.best_dist),
        res_sharded.best_dist,
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(res_single.success), res_sharded.success
    )


def test_sharded_attack_pads_odd_batch(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    cfg = CWPerturbConfig(binary_step=1, num_iter=10, budget=0.45)
    attack = build_cw_attack(model_fn, cfg)
    res = run_sharded_attack(
        attack, clouds[:5], labels[:5], jax.random.PRNGKey(0)
    )
    assert res.best_attack.shape[0] == 5  # sliced back from pad 8


def test_sharded_accuracy(trained_pointnet):
    model, variables, clouds, labels = trained_pointnet
    model_fn = make_model_fn(model, variables)
    acc = sharded_accuracy(model_fn, clouds, labels)
    assert acc == 1.0


def test_multihost_helpers_single_host():
    """Single-host degenerate path of the multi-host utilities."""
    from pointcloudattack_tpu.parallel import multihost as mh

    mesh = mh.global_mesh()
    assert mesh.devices.size == 8
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    gx = mh.host_local_batch_to_global(mesh, x)
    np.testing.assert_array_equal(np.asarray(gx), x)
