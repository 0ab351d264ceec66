"""Test configuration: run everything on a virtual 8-device CPU mesh.

The production target is TPU; correctness tests run on CPU with
``xla_force_host_platform_device_count=8`` so multi-device sharding is
exercised without real chips (same semantics, per JAX's SPMD model).

Note: the environment's sitecustomize imports jax at interpreter start,
so we override the platform via jax.config (env vars are too late).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
