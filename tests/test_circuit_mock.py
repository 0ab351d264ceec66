"""End-to-end circuit construction + vectorized mock checks.

Covers reference tests test_correct_encryption (src/aes128.rs:409-419)
and test_constraints (src/key_schedule.rs:385-392) plus the negative
tests the reference lacks (corrupt witness -> unsatisfied).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_aes_tpu.circuit import mock, witness
from halo2_aes_tpu.models import aes128
from halo2_aes_tpu.models import constants as C
from halo2_aes_tpu.ops import aes


def _build(k=17, n_sets=1, n_blocks=2, key=None, pts=None):
    cfg = aes128.AesConfig(k=k, n_sets=n_sets, n_blocks=n_blocks)
    layout = aes128.compile_circuit(cfg)
    key = np.zeros(16, np.uint8) if key is None else key
    if pts is None:
        rng = np.random.RandomState(0)
        pts = rng.randint(0, 256, (n_blocks, 16)).astype(np.uint8)
    pool = witness.build_pool(jnp.asarray(key), jnp.asarray(pts))
    vals = witness.assemble_values(layout, pool)
    return layout, np.asarray(vals), key, pts


def test_aes_circuit_satisfied():
    layout, vals, _, _ = _build()
    mock.assert_satisfied(layout, jnp.asarray(vals))


def test_multi_set_circuit_satisfied():
    # more blocks than one set can hold at k=17 forces use of set 1
    cfg = aes128.AesConfig(k=17, n_sets=2, n_blocks=100)
    layout = aes128.compile_circuit(cfg)
    caps = layout.meta["capacities"]
    assert caps[0] == ((1 << 17) - 6 - 400) // 1360  # == 96 < 100
    placements = layout.meta["placements"]
    assert placements[0][0] == 0 and placements[-1][0] == 1
    key = np.zeros(16, np.uint8)
    pts = np.arange(1600, dtype=np.uint8).reshape(100, 16)
    pool = witness.build_pool(jnp.asarray(key), jnp.asarray(pts))
    vals = witness.assemble_values(layout, pool)
    mock.assert_satisfied(layout, vals)


def test_dead_lookup_pruning():
    """Compile-time dead-lookup elimination (circuit/ir.py
    prune_dead_lookups): a selector that never fires takes its lookup
    argument with it, and the selector column drops out of the
    referenced (committed) set — so no all-zero fixed column is ever
    committed (identity point, rejected by halo2 transcripts)."""
    # spilled 2-set config: only set 1's key-schedule-less range lookup
    # is dead
    layout = aes128.compile_circuit(
        aes128.AesConfig(k=17, n_sets=2, n_blocks=100))
    assert layout.meta["pruned_lookups"] == ["u8 range check (set 1)"]
    assert len(layout.cs.lookups) == 9
    ref = layout.cs.referenced_columns()
    dead_sel = layout.meta["columns"].chip_sets[1].selectors[0]
    assert dead_sel not in ref
    # every referenced fixed column is nonzero somewhere
    for c in layout.fixed_ids():
        if c in ref:
            assert layout.fixed[c].any(), c

    # an EMPTY set loses all five of its lookups
    layout2 = aes128.compile_circuit(
        aes128.AesConfig(k=17, n_sets=2, n_blocks=3))
    assert len(layout2.cs.lookups) == 5
    assert len(layout2.meta["pruned_lookups"]) == 5
    ref2 = layout2.cs.referenced_columns()
    for c in layout2.fixed_ids():
        if c in ref2:
            assert layout2.fixed[c].any(), c


def test_ciphertext_in_witness():
    layout, vals, key, pts = _build(n_blocks=1)
    # last ark z-cells of block 0 hold the ciphertext
    cols = layout.meta["columns"]
    base = layout.meta["block_starts"][0]
    a2 = cols.chip_sets[0].advice[2]
    ct_cells = vals[a2, base + 1344 : base + 1360]
    expect = np.asarray(aes.encrypt(pts[0], key))
    assert list(ct_cells) == list(expect)


def test_sbox_255_path_satisfied():
    # routes 0xFF through the sbox lookup: our FIPS-correct table must
    # satisfy; the reference circuit satisfies too (self-consistent) but
    # yields a non-AES ciphertext — we additionally assert real AES.
    pts = np.zeros((1, 16), np.uint8)
    pts[0, 0] = 0xFF
    layout, vals, key, _ = _build(n_blocks=1, pts=pts)
    mock.assert_satisfied(layout, jnp.asarray(vals))
    cols = layout.meta["columns"]
    base = layout.meta["block_starts"][0]
    a2 = cols.chip_sets[0].advice[2]
    assert C.S_BOX[0xFF] == 0x16
    expect = np.asarray(aes.encrypt(pts[0], key))
    assert list(vals[a2, base + 1344 : base + 1360]) == list(expect)


def test_corrupt_lookup_rejected():
    layout, vals, _, _ = _build(n_blocks=1)
    cols = layout.meta["columns"]
    base = layout.meta["block_starts"][0]
    a2 = cols.chip_sets[0].advice[2]
    bad = vals.copy()
    # flip an xor output: row base+16 is the first initial-ARK xor row
    bad[a2, base + 16] ^= 1
    report = mock.check(layout, jnp.asarray(bad))
    assert not report.ok
    assert any("xor" in name for name, _ in report.lookup_failures)
    # its consumer copies from it, so the permutation also fails
    assert len(report.perm_failures) > 0


def test_corrupt_gate_rejected():
    layout, vals, _, _ = _build(n_blocks=1)
    cols = layout.meta["columns"]
    bad = vals.copy()
    # rc advice cell lives in the words column at row 20 (first rcon region)
    assert layout.fixed[cols.q_eq_rcon, 20] == 1
    bad[cols.words, 20] ^= 0xFF
    report = mock.check(layout, jnp.asarray(bad))
    assert any(name == "Equality RC" for name, _ in report.gate_failures)


def test_corrupt_copy_rejected():
    layout, vals, _, _ = _build(n_blocks=1)
    cols = layout.meta["columns"]
    base = layout.meta["block_starts"][0]
    a0 = cols.chip_sets[0].advice[0]
    bad = vals.copy()
    # plaintext byte 0 feeds ark0 x-cell via a copy; change only the source
    bad[a0, base + 0] ^= 1
    report = mock.check(layout, jnp.asarray(bad))
    assert len(report.perm_failures) > 0


def test_key_schedule_only_circuit():
    """Key-schedule-alone proving config (reference benches/key_schedule.rs:
    one 10-round expansion per proof, k=17)."""
    cfg = aes128.AesConfig(k=17, n_sets=1, n_blocks=0)
    layout = aes128.compile_circuit(cfg)
    key = np.arange(16, dtype=np.uint8)
    pool = witness.build_pool(jnp.asarray(key), jnp.zeros((0, 16), jnp.uint8))
    mock.assert_satisfied(layout, witness.assemble_values(layout, pool))


def test_expose_ciphertext_instance():
    """Public-input exposure (reference TODO src/aes128.rs:174): instance
    rows carry the ciphertext, bound by copy constraints."""
    cfg = aes128.AesConfig(k=17, n_sets=1, n_blocks=2, expose_ciphertext=True)
    layout = aes128.compile_circuit(cfg)
    key = np.zeros(16, np.uint8)
    pts = np.arange(32, dtype=np.uint8).reshape(2, 16)
    pool = witness.build_pool(jnp.asarray(key), jnp.asarray(pts))
    vals = np.asarray(witness.assemble_values(layout, pool))
    mock.assert_satisfied(layout, jnp.asarray(vals))
    inst = layout.meta["columns"].instance
    expect = np.asarray(aes.encrypt(pts, key)).reshape(-1)
    assert list(vals[inst, :32]) == list(expect)
    # tampering with the public input breaks the copy constraints
    bad = vals.copy()
    bad[inst, 3] ^= 1
    assert len(mock.check(layout, jnp.asarray(bad)).perm_failures) > 0


def test_capacity_error():
    with pytest.raises(aes128.CapacityError):
        aes128.compile_circuit(aes128.AesConfig(k=17, n_sets=1, n_blocks=10_000))
    with pytest.raises(aes128.CapacityError):
        aes128.compile_circuit(aes128.AesConfig(k=10, n_sets=1, n_blocks=1))


def test_capacity_formula():
    # matches reference-derived formula with blinding correction:
    # usable = 2^k - 6; set0: (usable - 400)//1360
    cfg = aes128.AesConfig(k=17, n_sets=3, n_blocks=1)
    layout = aes128.compile_circuit(cfg)
    caps = layout.meta["capacities"]
    usable = (1 << 17) - 6
    assert caps == [(usable - 400) // 1360, usable // 1360, usable // 1360]


def test_row_accounting():
    # 1360 rows per block exactly (reference src/constant.rs:114)
    layout, vals, _, _ = _build(n_blocks=1)
    cols = layout.meta["columns"]
    a0 = cols.chip_sets[0].advice[0]
    wm = layout.witness_map[a0]
    used = np.nonzero(wm >= 0)[0]
    assert used.min() == 0 and used.max() == 400 + 1360 - 1


def test_tagged_ops_lean_circuit():
    """LEAN mode (AesConfig.tagged_ops): sbox/mul2/mul3 fuse into ONE
    tagged lookup per set — 3 lookup arguments instead of the
    reference's 5 (src/aes128.rs:63-115) with identical row layout.
    Satisfiability must hold on a spilled 2-set config, a corrupted op
    output must be rejected, and FIPS-197 ciphertext bytes must land in
    the instance rows exactly as in reference mode."""
    cfg = aes128.AesConfig(k=17, n_sets=2, n_blocks=100, tagged_ops=True)
    layout = aes128.compile_circuit(cfg)
    names = [lk.name for lk in layout.cs.lookups]
    assert names == ["u8 range check (set 0)", "u8 xor (set 0)",
                     "tagged table op (set 0)", "u8 xor (set 1)",
                     "tagged table op (set 1)"]
    key = np.zeros(16, np.uint8)
    pts = np.arange(1600, dtype=np.uint8).reshape(100, 16)
    pool = witness.build_pool(jnp.asarray(key), jnp.asarray(pts))
    vals = witness.assemble_values(layout, pool)
    mock.assert_satisfied(layout, vals)

    # corrupt one sbox output byte -> tagged-op lookup must fail
    v = np.asarray(vals).copy()
    cols = layout.meta["columns"]
    base = int(layout.meta["block_starts"][0])
    a1 = cols.chip_sets[0].advice[1]
    v[a1, base + 32] ^= 1
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        mock.assert_satisfied(layout, jnp.asarray(v))

    # same witness values as reference mode (row layout is shared; the
    # column IDS differ — tagged mode inserts op_tag columns)
    ref = aes128.compile_circuit(
        aes128.AesConfig(k=17, n_sets=2, n_blocks=100))
    vals_ref = witness.assemble_values(ref, pool)
    a0 = cols.chip_sets[0].advice[0]
    a0_ref = ref.meta["columns"].chip_sets[0].advice[0]
    np.testing.assert_array_equal(np.asarray(vals[a0]),
                                  np.asarray(vals_ref[a0_ref]))
