"""Mini-AES (GF(2^4)) model: witness/table consistency + mock checks.

Fast-tier companion to tests/test_parallel.py::test_mesh_aes_shaped_prove
(the mesh prove of the same circuit)."""

import jax.numpy as jnp
import numpy as np

from halo2_aes_tpu.circuit import mock, witness
from halo2_aes_tpu.models import aes_mini as MINI


def test_gf16_tables():
    assert sorted(MINI.S_BOX4.tolist()) == list(range(16))
    # mul tables are GF(2^4) linear: T[a^b] == T[a]^T[b]
    for tab in (MINI.MUL2_4, MINI.MUL3_4):
        for a in range(16):
            for b in range(16):
                assert tab[a ^ b] == tab[a] ^ tab[b]
    assert MINI.MUL2_4[1] == 2 and MINI.MUL3_4[1] == 3
    # rcon doubling sequence
    for i in range(1, 10):
        assert MINI.RCON4[i] == MINI._gf16_mul(2, int(MINI.RCON4[i - 1]))


def test_mini_table_layout():
    t = MINI.build_mini_table(1 << 11)
    assert all(int(t[c, 320]) == 0 for c in range(4))  # zero padding row
    a, b = 5, 12
    row = 32 + a * 16 + b
    assert (int(t[1, row]), int(t[2, row]), int(t[3, row])) == (a, b, a ^ b)
    assert int(t[2, 16 + 7]) == int(MINI.S_BOX4[7])


def test_mini_mock_satisfied_and_negative():
    cfg = MINI.MiniAesConfig(k=11, n_sets=2, n_blocks=2)
    layout = MINI.compile_mini_circuit(cfg)
    rng = np.random.default_rng(4)
    key = jnp.asarray(rng.integers(0, 16, 16, dtype=np.uint8))
    pts = jnp.asarray(rng.integers(0, 16, (2, 16), dtype=np.uint8))
    pool = MINI.build_pool_mini(key, pts)
    values = witness.assemble_values(layout, pool)
    counts = mock.violation_counts(layout, values)
    assert all(int(v) == 0 for v in counts.values()), counts
    # corrupt one witness nibble -> the checker must object
    bad = np.asarray(pool).copy()
    bad[400] ^= 1
    values_bad = witness.assemble_values(layout, jnp.asarray(bad))
    counts_bad = mock.violation_counts(layout, values_bad)
    assert sum(int(v) for v in counts_bad.values()) > 0
