"""AES witness engine tests: FIPS-197 known answers, S-box index 255,
random cross-check against an independent from-spec python oracle.

These close the exact gaps that let the reference's S_BOX[255] bug
survive (reference src/constant.rs:14; no KAT tests, reference
src/aes128.rs:421-434 commented out).
"""

import numpy as np
import jax.numpy as jnp

from halo2_aes_tpu.models import constants as C
from halo2_aes_tpu.ops import aes


# --- independent python oracle (written from FIPS-197, byte-at-a-time) ---

def _xtime(a):
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a, b):
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


_SBOX = [int(v) for v in C.S_BOX]  # table itself is asserted against FIPS below


def _py_expand(key):
    words = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    rcon = [1, 2, 4, 8, 16, 32, 64, 128, 27, 54]
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    return [sum([words[4 * r + c] for c in range(4)], []) for r in range(11)]


def _py_encrypt(pt, key):
    rks = _py_expand(list(key))
    s = [p ^ k for p, k in zip(pt, rks[0])]
    for rnd in range(1, 11):
        s = [_SBOX[b] for b in s]
        # shift rows over column-major layout
        s = [s[4 * ((c + r) % 4) + r] for c in range(4) for r in range(4)]
        if rnd < 10:
            m = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                for r in range(4):
                    coef = [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]][r]
                    m.append(_gmul(col[0], coef[0]) ^ _gmul(col[1], coef[1])
                             ^ _gmul(col[2], coef[2]) ^ _gmul(col[3], coef[3]))
            s = m
        s = [a ^ b for a, b in zip(s, rks[rnd])]
    return s


# --- tests ----------------------------------------------------------------

def test_sbox_fips_values():
    # spot values straight from the FIPS-197 table, incl. the entry the
    # reference gets wrong (S_BOX[0xFF] must be 0x16, not 0x17).
    assert C.S_BOX[0x00] == 0x63
    assert C.S_BOX[0x01] == 0x7C
    assert C.S_BOX[0x53] == 0xED
    assert C.S_BOX[0xFF] == 0x16
    # bijectivity
    assert len(set(int(v) for v in C.S_BOX)) == 256


def test_mul_tables():
    for t, k in [(C.MUL_BY_2, 2), (C.MUL_BY_3, 3), (C.MUL_BY_9, 9),
                 (C.MUL_BY_11, 11), (C.MUL_BY_13, 13), (C.MUL_BY_14, 14)]:
        for x in [0, 1, 0x80, 0xFF, 0x53]:
            assert t[x] == _gmul(x, k)


def test_fips197_appendix_b():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes.encrypt(np.frombuffer(pt, np.uint8), np.frombuffer(key, np.uint8))
    assert bytes(np.asarray(ct)).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_zero_vector():
    ct = aes.encrypt(np.zeros(16, np.uint8), np.zeros(16, np.uint8))
    assert bytes(np.asarray(ct)).hex() == "66e94bd4ef8a2c3b884cfa59ca342b2e"


def test_key_expansion_zero_key():
    # first expanded words for the all-zero key (FIPS-197 data, also used
    # by the reference's ignored regression test, key_schedule.rs:337).
    _, rks = aes.expand_key(jnp.zeros(16, jnp.uint8))
    rks = np.asarray(rks)
    assert bytes(rks[1]).hex() == "62636363" * 4
    assert bytes(rks[2]).hex() == "9b9898c9f9fbfbaa9b9898c9f9fbfbaa"
    assert bytes(rks[10]).hex() == "b4ef5bcb3e92e21123e951cf6f8f188e"


def test_sbox_255_is_exercised():
    # plaintext byte 0xFF with zero key routes 0xFF through SubBytes in
    # round 1; the reference circuit would produce a wrong ciphertext here.
    pt = np.zeros(16, np.uint8)
    pt[0] = 0xFF
    ct = aes.encrypt(pt, np.zeros(16, np.uint8))
    assert list(np.asarray(ct)) == _py_encrypt(list(pt), [0] * 16)


def test_random_cross_check():
    rng = np.random.RandomState(42)
    for _ in range(5):
        key = rng.randint(0, 256, 16).astype(np.uint8)
        pts = rng.randint(0, 256, (8, 16)).astype(np.uint8)
        cts = np.asarray(aes.encrypt(pts, key))
        for p, c in zip(pts, cts):
            assert list(c) == _py_encrypt(list(p), list(key))


def test_pool_shapes_and_consistency():
    key = np.arange(16, dtype=np.uint8)
    ks_pool, rks = aes.expand_key(jnp.asarray(key))
    assert ks_pool.shape == (aes.KS_POOL_LEN,)
    pt = np.arange(16, dtype=np.uint8)[::-1].copy()
    pool = aes.block_pool(jnp.asarray(pt), rks)
    assert pool.shape == (aes.BLOCK_POOL_LEN,)
    # trace internals line up with the oracle
    assert list(np.asarray(pool[-16:])) == _py_encrypt(list(pt), list(key))
    # initial ARK
    assert list(np.asarray(pool[16:32])) == [p ^ k for p, k in zip(pt, key)]
    # round-key bytes embedded in ks pool equal oracle expansion
    py_rks = _py_expand(list(key))
    for r in range(1, 11):
        base = 16 + (r - 1) * 32
        assert list(np.asarray(ks_pool[base + 16 : base + 32])) == py_rks[r]


def test_ctr_blocks():
    blocks = aes.ctr_blocks(nonce=7, count=3)
    assert blocks.shape == (3, 16)
    assert int.from_bytes(bytes(blocks[2]), "big") == (7 << 64) | 2
