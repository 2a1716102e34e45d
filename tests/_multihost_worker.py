"""Two-process jax.distributed smoke worker (spawned by
tests/test_parallel.py::test_multihost_two_process_smoke).

Each process owns 2 virtual CPU devices; the pair forms a 4-device
global 'data' mesh.  Validates the real multi-process code paths of
parallel/multihost.py that the single-host test cannot reach:
initialize_distributed with an explicit coordinator, global_mesh over
non-addressable devices, host_local_batch_to_global assembly, and a
replicated global reduction (the psum'd-counter pattern of
parallel/driver.py).

Prints exactly one line "MULTIHOST_OK <global_sum>" on success.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize force-registers the axon TPU platform; pin CPU before
# any backend is materialized (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pointcloudattack_tpu.parallel import multihost as mh  # noqa: E402


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    mh.initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()

    mesh = mh.global_mesh()
    assert mesh.devices.size == 4, mesh.devices.size

    # per-host local batch shard: process p holds rows 4p..4p+3 of the
    # global [8, 3] batch
    local = (
        np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100.0 * pid
    )
    gx = mh.host_local_batch_to_global(mesh, local)
    assert gx.shape == (8, 3), gx.shape
    assert not gx.is_fully_addressable

    # the driver's psum'd-counter pattern: replicated global reduction,
    # fetchable on every process
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(gx)
    expected = float(
        sum(np.arange(12, dtype=np.float32) + 100.0 * p for p in (0, 1)).sum()
    )
    got = float(jax.device_get(total))
    assert abs(got - expected) < 1e-3, (got, expected)

    # each process's addressable shards must hold ITS OWN rows (DCN
    # assembly correctness, not just shape)
    for shard in gx.addressable_shards:
        row0 = shard.index[0].start or 0
        np.testing.assert_array_equal(
            np.asarray(shard.data), local[row0 - 4 * pid: row0 - 4 * pid + shard.data.shape[0]],
        )
        assert 4 * pid <= row0 < 4 * (pid + 1), (pid, shard.index)

    print(f"MULTIHOST_OK {got}")


if __name__ == "__main__":
    main()
