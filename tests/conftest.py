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
# XLA-CPU compiles of big limb-arithmetic graphs take ~10s each; cache them
# across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/halo2_aes_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
