"""Device-side witness assembly: AES trace pool -> column value matrix.

The whole synthesis step of the reference (third pass of
create_proof, reference src/main.rs:94 and SURVEY.md section 3.1) becomes:
one batched AES trace (ops/aes.py) + one gather per the precomputed
witness map.  No regions, no cells, no layouter.
"""

from __future__ import annotations

import jax.numpy as jnp

from halo2_aes_tpu.circuit.ir import CompiledCircuit
from halo2_aes_tpu.ops import aes


def build_pool(key, plaintexts):
    """key uint8[16], plaintexts uint8[B,16] -> uint8 global witness pool."""
    ks_pool, rks = aes.expand_key(key)
    pools = aes.block_pool_batch(plaintexts, rks)
    return jnp.concatenate([ks_pool, pools.reshape(-1)])


def build_dec_pool(key, ciphertexts):
    """Decryption witness pool (models/aes128_dec.py layout): the same
    forward key expansion followed by batched inverse-cipher traces."""
    ks_pool, rks = aes.expand_key(key)
    pools = aes.dec_block_pool_batch(ciphertexts, rks)
    return jnp.concatenate([ks_pool, pools.reshape(-1)])


def assemble_values(layout: CompiledCircuit, pool):
    """-> uint32[num_columns, n]: advice values from the pool merged with
    fixed-column values (selectors, tables, rcon).  This merged matrix is
    what the mock checker evaluates; the prover lifts advice columns to
    field form separately."""
    wm = jnp.asarray(layout.witness_map)
    gathered = jnp.take(pool, jnp.clip(wm, 0).reshape(-1)).reshape(wm.shape)
    advice_vals = jnp.where(wm >= 0, gathered.astype(jnp.uint32), jnp.uint32(0))
    return advice_vals + jnp.asarray(layout.fixed)
