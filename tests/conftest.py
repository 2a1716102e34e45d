"""Test harness: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use this virtual mesh; TPU-only Pallas kernels
fall back to their XLA paths automatically on CPU.

NOTE: this environment's sitecustomize registers an 'axon' TPU backend and
force-sets ``jax_platforms=axon,cpu`` via jax.config (so plain env vars are
ignored); the config update below must come after importing jax.
"""

import os

# keep the CLI's persistent compilation cache OUT of test runs: CLI tests
# call cli.main() in-process, which would otherwise flip the global
# jax_compilation_cache_dir and persist every subsequent CPU compile
os.environ.setdefault("PCA_COMPILE_CACHE", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def trained_pointnet():
    """Tiny PointNet trained to 100% on separable synthetic data."""
    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
    from pointcloudattack_tpu.train.trainer import TrainConfig, fit

    num_classes, num_points = 3, 64
    clouds, labels = make_synthetic_clouds(num_classes, 12, num_points)
    model = models.make_model("PointNet", num_classes)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=num_points, batch=2
    )
    cfg = TrainConfig(epochs=30, batch_size=12)
    variables = fit(model, variables, cfg, clouds, labels)
    out, _ = model.apply(variables, jnp.asarray(clouds), train=False)
    acc = float(np.mean(np.argmax(np.asarray(out), -1) == labels))
    assert acc == 1.0, f"fixture model failed to fit (acc={acc})"
    return model, variables, clouds, labels
