"""Test configuration: CPU backend, float64, 8 virtual devices for the
multi-chip sharding tests (the driver separately dry-runs the mesh path).

Note: the environment's sitecustomize registers the axon TPU backend and sets
JAX_PLATFORMS=axon; ``jax.config.update('jax_platforms', 'cpu')`` reliably
overrides it even after that import, so tests are hermetic on CPU/f64.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
