"""Headline benchmark: prints ONE JSON line with the flagship metric.

Current flagship path: batched AES-128 witness generation + full
vectorized constraint check (the MockProver-equivalent pipeline,
reference src/aes128.rs:409-419) at k=17 on the attached device.

The reference publishes no numbers (BASELINE.md): its README is empty of
results and its AES criterion bench cannot run as checked in
(reference/benches/aes128.rs:90 requests 6000 blocks > 3853 capacity).
``vs_baseline`` is therefore reported against an explicit estimate,
documented below, until a Rust CPU measurement exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Estimated reference throughput in AES blocks/sec for the MockProver
# check path (halo2 MockProver at K=20/N=3/1000 blocks takes minutes on
# desktop CPUs for lookup-heavy circuits; 1000 blocks / 180 s ~= 5.6).
# Replace with a measured number when a Rust toolchain is available.
ESTIMATED_REFERENCE_BLOCKS_PER_SEC = 5.6


def main():
    from halo2_aes_tpu.circuit import mock, witness
    from halo2_aes_tpu.models.aes128 import AesConfig, compile_circuit

    cfg = AesConfig(k=17, n_sets=2, n_blocks=192)
    layout = compile_circuit(cfg)

    @jax.jit
    def step(key, plaintexts):
        pool = witness.build_pool(key, plaintexts)
        values = witness.assemble_values(layout, pool)
        return mock.violation_counts(layout, values)

    key = jnp.zeros(16, dtype=jnp.uint8)
    plaintexts = jnp.arange(cfg.n_blocks * 16, dtype=jnp.uint8).reshape(-1, 16)

    counts = jax.block_until_ready(step(key, plaintexts))  # compile + warm
    assert all(int(v) == 0 for v in counts.values()), counts

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        counts = jax.block_until_ready(step(key, plaintexts))
    dt = (time.perf_counter() - t0) / reps

    blocks_per_sec = cfg.n_blocks / dt
    print(json.dumps({
        "metric": "aes128_witness_plus_constraint_check_blocks_per_sec_k17",
        "value": round(blocks_per_sec, 2),
        "unit": "blocks/s",
        "vs_baseline": round(blocks_per_sec / ESTIMATED_REFERENCE_BLOCKS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
