"""AES-128 decryption: witness oracle + circuit mock checks.

The reference stages the InvMixColumns tables but implements no
decryption (reference src/constant.rs:49-111); these tests cover our
completed decryption family (models/aes128_dec.py): FIPS-197 inverse
cipher correctness, circuit satisfiability, and negative tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_aes_tpu.circuit import mock, witness
from halo2_aes_tpu.models import aes128_dec as dec
from halo2_aes_tpu.models import constants as C
from halo2_aes_tpu.models import table as T
from halo2_aes_tpu.ops import aes

KEY = np.frombuffer(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"), np.uint8)
PT = np.frombuffer(bytes.fromhex("3243f6a8885a308d313198a2e0370734"), np.uint8)
CT = np.frombuffer(bytes.fromhex("3925841d02dc09fbdc118597196a0b32"), np.uint8)


# ---------------------------------------------------------------------------
# oracle (ops/aes.py)
# ---------------------------------------------------------------------------


def test_inv_sbox_is_inverse():
    assert (C.INV_S_BOX[C.S_BOX] == np.arange(256)).all()
    assert (C.S_BOX[C.INV_S_BOX] == np.arange(256)).all()
    # the reference's S_BOX[255] bug would break this pair at 0x16/0xFF
    assert C.INV_S_BOX[0x16] == 0xFF


def test_decrypt_fips_vector():
    assert bytes(np.asarray(aes.decrypt(CT, KEY))) == bytes(PT)


def test_decrypt_inverts_encrypt_random():
    rng = np.random.default_rng(7)
    key = rng.integers(0, 256, 16, dtype=np.uint8)
    pts = rng.integers(0, 256, (32, 16), dtype=np.uint8)
    cts = np.asarray(aes.encrypt(pts, key))
    assert (np.asarray(aes.decrypt(cts, key)) == pts).all()


def test_dec_table_contents():
    tbl = T.build_dec_table(1 << 17)
    base = C.TABLE_ROWS
    assert (tbl[0, base : base + 256] == int(T.Tag.INV_SBOX)).all()
    assert (tbl[2, base : base + 256] == C.INV_S_BOX).all()
    assert (tbl[2, base + 4 * 256 : base + 5 * 256] == C.MUL_BY_14).all()
    # zero rows remain beyond the content for disabled lookups
    assert (tbl[:, C.DEC_TABLE_ROWS] == 0).all()


# ---------------------------------------------------------------------------
# circuit (models/aes128_dec.py)
# ---------------------------------------------------------------------------


def _build(n_sets=1, n_blocks=2, expose=False, cts=None):
    cfg = dec.AesDecConfig(k=17, n_sets=n_sets, n_blocks=n_blocks,
                           expose_plaintext=expose)
    layout = dec.compile_circuit(cfg)
    if cts is None:
        rng = np.random.default_rng(3)
        pts = rng.integers(0, 256, (n_blocks, 16), dtype=np.uint8)
        cts = np.asarray(aes.encrypt(pts, KEY))
    pool = witness.build_dec_pool(jnp.asarray(KEY), jnp.asarray(cts))
    vals = witness.assemble_values(layout, pool)
    return layout, np.asarray(vals), cts


def test_dec_circuit_satisfied():
    layout, vals, _ = _build()
    mock.assert_satisfied(layout, jnp.asarray(vals))
    # leaner lookup design: 3 lookup arguments per column set
    assert len(layout.cs.lookups) == 3


def test_dec_recovers_plaintext_in_witness():
    layout, vals, cts = _build(n_blocks=1, cts=CT.reshape(1, 16))
    cols = layout.meta["columns"]
    base = layout.meta["block_starts"][0]
    a2 = cols.chip_sets[0].advice[2]
    assert bytes(vals[a2, base + 1344 : base + 1360].astype(np.uint8)) == bytes(PT)


def test_dec_multi_set_satisfied():
    # 100 blocks spill past set 0's 96-block capacity so set 1's lookups
    # are live; its range lookup (key-schedule-only) is pruned at compile
    layout, vals, _ = _build(n_sets=2, n_blocks=100)
    mock.assert_satisfied(layout, jnp.asarray(vals))
    assert len(layout.cs.lookups) == 5
    assert layout.meta["pruned_lookups"] == ["u8 range check (dec set 1)"]


def test_dec_corrupt_op_rejected():
    layout, vals, _ = _build(n_blocks=1)
    cols = layout.meta["columns"]
    base = layout.meta["block_starts"][0]
    a1 = cols.chip_sets[0].advice[1]
    bad = vals.copy()
    # first InvSubBytes output (row base+32 is round rr=1's first op row)
    bad[a1, base + 32] ^= 1
    report = mock.check(layout, jnp.asarray(bad))
    assert not report.ok
    assert any("tagged table op" in name for name, _ in report.lookup_failures)


def test_dec_corrupt_tag_semantics():
    """A mul-9 row must not accept a mul-11 result: the tag column pins
    which sub-table each op row resolves against."""
    layout, vals, _ = _build(n_blocks=1)
    cols = layout.meta["columns"]
    base = layout.meta["block_starts"][0]
    chip = cols.chip_sets[0]
    # find a mul-9 lcon row and replace its output with the mul-11 value
    bt = dec.build_dec_block_template()
    rows = np.nonzero(bt.tag == int(T.Tag.GFMUL9))[0]
    row = base + int(rows[0])
    x = int(vals[chip.advice[0], row])
    bad = vals.copy()
    assert C.MUL_BY_9[x] == vals[chip.advice[1], row]
    if C.MUL_BY_11[x] == C.MUL_BY_9[x]:
        row = base + int(rows[1])
        x = int(vals[chip.advice[0], row])
    bad[chip.advice[1], row] = C.MUL_BY_11[x]
    if C.MUL_BY_11[x] != C.MUL_BY_9[x]:
        report = mock.check(layout, jnp.asarray(bad))
        assert any("tagged table op" in name
                   for name, _ in report.lookup_failures)


def test_dec_expose_plaintext_instance():
    layout, vals, cts = _build(n_blocks=2, expose=True)
    mock.assert_satisfied(layout, jnp.asarray(vals))
    inst = layout.meta["columns"].instance
    expect = np.asarray(aes.decrypt(cts, KEY)).reshape(-1)
    assert list(vals[inst, :32]) == list(expect)
    bad = vals.copy()
    bad[inst, 5] ^= 1
    assert len(mock.check(layout, jnp.asarray(bad)).perm_failures) > 0


def test_dec_capacity_error():
    with pytest.raises(dec.CapacityError):
        dec.compile_circuit(dec.AesDecConfig(k=17, n_blocks=10_000))
    with pytest.raises(dec.CapacityError):
        dec.compile_circuit(dec.AesDecConfig(k=16, n_blocks=1))


def test_dec_row_accounting():
    layout, _, _ = _build(n_blocks=1)
    a0 = layout.meta["columns"].chip_sets[0].advice[0]
    used = np.nonzero(layout.witness_map[a0] >= 0)[0]
    assert used.min() == 0 and used.max() == 400 + 1360 - 1
