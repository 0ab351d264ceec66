"""AES-128-CTR proving: streamed keystream proofs + public XOR.

CTR mode turns the fixed-key block circuit into a verifiable stream
cipher: keystream block i = AES_ENC(key, nonce || counter(i)) and
ciphertext = plaintext XOR keystream.  The XOR is public bookkeeping;
the proof obligation is exactly the batched fixed-key encryption the
circuit already proves (models/aes128.py), with the counter blocks as
in-circuit plaintexts and the keystream bytes exposed through the
instance column, so a verifier can bind the ciphertext to the key
without learning it.

This is BASELINE.json config 5's driver shape (64K-block AES-CTR):
one layout is compiled at a fixed ``blocks_per_proof`` and reused for
every chunk — compile once, prove many — optionally with the prover's
NTTs/MSMs sharded over a device mesh (prove(mesh=...)).  The resulting
bundle verifies with ONE pairing-product check via
``verifier.verify_batch`` regardless of how many proofs it holds.

The reference has no mode-of-operation layer (its driver proves raw
blocks, reference src/main.rs:83-108); this module is a deliberate
capability addition on top of capability parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def counter_blocks(nonce: bytes, start: int, count: int) -> np.ndarray:
    """(count, 16) uint8 CTR input blocks: 96-bit nonce || 32-bit
    big-endian block counter (NIST SP 800-38A / RFC 3686 layout)."""
    assert len(nonce) == 12, "CTR nonce must be 12 bytes"
    assert 0 <= start and start + count <= 1 << 32, "counter overflow"
    out = np.zeros((count, 16), dtype=np.uint8)
    out[:, :12] = np.frombuffer(nonce, dtype=np.uint8)
    ctr = (start + np.arange(count, dtype=np.uint64)).astype(np.uint32)
    out[:, 12:] = ctr[:, None] >> np.array([24, 16, 8, 0], np.uint32)
    return out


@dataclass
class CtrBundle:
    """A proven CTR keystream: chunked proofs + the public keystream."""

    nonce: bytes
    start: int
    n_blocks: int              # keystream blocks actually used
    blocks_per_proof: int
    keystream: np.ndarray      # (ceil(n_blocks/bpp)*bpp, 16) uint8
    proofs: list = field(default_factory=list)

    def instances(self) -> list:
        """Per-proof instance lists (the exposed keystream bytes)."""
        bpp = self.blocks_per_proof
        ks = self.keystream.reshape(-1, bpp * 16)
        return [[int(v) for v in row] for row in ks]


def prove_keystream(pk, key, nonce: bytes, n_blocks: int, *, start: int = 0,
                    mesh=None, mesh_axis: str = "dp",
                    checkpoint_dir: str | None = None,
                    progress=None) -> CtrBundle:
    """Prove ``n_blocks`` keystream blocks under ``pk`` (an AES-128
    layout compiled with expose_ciphertext=True); the final partial
    chunk is padded with extra counter blocks (proving surplus
    keystream is sound and keeps every proof one compiled shape)."""
    import jax
    import jax.numpy as jnp

    from halo2_aes_tpu.backend.prover import prove
    from halo2_aes_tpu.circuit import witness

    layout = pk.layout
    assert layout.instance_ids(), (
        "CTR proving needs the keystream exposed: compile the layout "
        "with expose_ciphertext=True")
    bpp = layout.meta["config"].n_blocks
    chunks = -(-n_blocks // bpp)
    key = jnp.asarray(np.asarray(key, dtype=np.uint8))
    ks_rows = []
    proofs = []
    for ci in range(chunks):
        ctrs = counter_blocks(nonce, start + ci * bpp, bpp)
        pool = witness.build_pool(key, jnp.asarray(ctrs))
        values = jax.block_until_ready(
            witness.assemble_values(layout, pool))
        proofs.append(prove(pk, values, mesh=mesh, mesh_axis=mesh_axis,
                            checkpoint_dir=checkpoint_dir))
        inst_col = layout.instance_ids()[0]
        ks_rows.append(np.asarray(values[inst_col][: bpp * 16],
                                  dtype=np.uint8).reshape(bpp, 16))
        if progress is not None:
            progress(ci + 1, chunks)
    return CtrBundle(nonce=nonce, start=start, n_blocks=n_blocks,
                     blocks_per_proof=bpp,
                     keystream=np.concatenate(ks_rows), proofs=proofs)


def verify_bundle(vk, bundle: CtrBundle, multiopen: str = "shplonk") -> bool:
    """One pairing-product check for the whole bundle; also re-derives
    each proof's instance bytes from the public keystream so a tampered
    keystream fails even when its proofs are individually honest."""
    from halo2_aes_tpu.backend.verifier import verify_batch

    return verify_batch(vk, bundle.proofs, [[i] for i in bundle.instances()],
                        multiopen=multiopen)


def xor_keystream(bundle: CtrBundle, data: bytes) -> bytes:
    """CTR encrypt/decrypt: data XOR keystream (public, not proven)."""
    assert len(data) <= bundle.n_blocks * 16, "keystream too short"
    ks = bundle.keystream.reshape(-1)[: len(data)]
    return bytes(np.bitwise_xor(
        np.frombuffer(data, dtype=np.uint8), ks).tobytes())
