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

# HALO2_TEST_DEVICE=tpu runs the suite against the attached accelerator
# instead (used for the AES-scale slow tier, which auto-enables on
# non-CPU backends — tests/test_aes_prove.py); default stays the CPU
# mesh so multi-device sharding is exercised without hardware.
_TEST_DEVICE = os.environ.get("HALO2_TEST_DEVICE", "cpu")
if _TEST_DEVICE == "cpu":
    jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is deliberately NOT enabled:
# jaxlib segfaults deserializing cached executables of the big MSM scan
# graphs (reproduced twice on this host, 2026-08-16).  In-process pjit
# caching still applies.

# The CI/dev host has ONE cpu; unrolled limb kernels make XLA-CPU compiles
# of MSM/prover graphs take tens of minutes.  Compact (fori_loop) kernels
# trade runtime fusion for ~100x smaller traced graphs.
from halo2_aes_tpu.ops import field  # noqa: E402

if _TEST_DEVICE == "cpu":
    field.set_compact_graphs(True)
else:
    # accelerator run: production kernel policy (Pallas fast sites)
    from halo2_aes_tpu.ops import pallas_field  # noqa: E402
    from halo2_aes_tpu.utils.cache import enable_compile_cache  # noqa: E402

    pallas_field.enable_in_field_ops()
    enable_compile_cache()
