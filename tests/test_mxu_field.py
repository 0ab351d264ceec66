"""MXU int8-matmul field path vs the VPU limb kernel and host bigints.

Covers ops/mxu_field.py: nibble packing, banded fixed-operand multiply
(semantics identical to mont_mul), the widened-R' full-word Montgomery
reduction, and the block-banded matmul-DFT against a naive host DFT.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops import mxu_field as MX

SPEC = F.FR
P = SPEC.modulus
rng = random.Random(0xA15)


def _rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def test_nibble_roundtrip():
    xs = _rand_elems(32) + [0, P - 1]
    limbs = F.ints_to_limbs_fast(xs)
    nib = np.asarray(MX.nibbles_from_limbs(jnp.asarray(limbs)))
    assert nib.dtype == np.int8 and nib.min() >= 0 and nib.max() <= 15
    w = np.array([1 << (4 * i) for i in range(MX.NIBS)], dtype=object)
    back = [int(sum(int(v) * int(ww) for v, ww in zip(row, w)))
            for row in nib]
    assert back == xs


def test_fixed_mul_matches_mont_mul():
    b = rng.randrange(P)
    mul = MX.FixedMul(SPEC, b)
    a_vals = _rand_elems(64) + [0, 1, P - 1]
    a = jnp.asarray(F.ints_to_limbs_fast(a_vals))
    b_limbs = jnp.asarray(F.int_to_limbs(b))
    got = np.asarray(mul(a))
    want = np.asarray(F.mont_mul(SPEC, a, b_limbs))
    assert got.tolist() == want.tolist()


def test_fixed_mul_edge_operands():
    for b in (0, 1, P - 1, (1 << 255) % P):
        mul = MX.FixedMul(SPEC, b)
        a_vals = [0, 1, P - 1, rng.randrange(P)]
        a = jnp.asarray(F.ints_to_limbs_fast(a_vals))
        got = np.asarray(mul(a))
        want = np.asarray(F.mont_mul(SPEC, a, jnp.asarray(F.int_to_limbs(b))))
        assert got.tolist() == want.tolist(), b


def test_reduce_wide_host_check():
    # random t < p * R' over the full 33-limb range
    ts = [rng.randrange(P << MX.RP_BITS) for _ in range(16)]
    limbs = np.zeros((len(ts), 33), dtype=np.uint32)
    for i, t in enumerate(ts):
        for j in range(33):
            limbs[i, j] = (t >> (16 * j)) & 0xFFFF
    got = F.limbs_to_ints(np.asarray(MX.reduce_wide(SPEC, jnp.asarray(limbs))))
    rp_inv = pow(1 << MX.RP_BITS, -1, P)
    want = [(t * rp_inv) % P for t in ts]
    assert got == want


@pytest.mark.parametrize("n", [4, 16])
def test_dft_matmul_vs_naive(n):
    # twiddle matrix from the NTT root (the real inner-stage shape)
    omega = pow(SPEC.generator, (P - 1) // n, P)
    w = [[pow(omega, j * k, P) for k in range(n)] for j in range(n)]
    dft = MX.DftMatmul(SPEC, w)
    batch = 5
    xs = [[rng.randrange(P) for _ in range(n)] for _ in range(batch)]
    # inputs in Montgomery form, as the prover holds them
    x = jnp.asarray(np.stack([SPEC.encode(row) for row in xs]))
    got_mont = np.asarray(dft(x)).reshape(batch * n, F.LIMBS)
    got = [SPEC.from_mont_host(v) for v in F.limbs_to_ints(got_mont)]
    want = [sum(w[j][k] * row[k] for k in range(n)) % P
            for row in xs for j in range(n)]
    assert got == want


def test_ntt256_vs_naive_dft():
    n = 256
    omega = pow(SPEC.generator, (P - 1) // n, P)
    xs = [rng.randrange(P) for _ in range(n)]
    x = jnp.asarray(SPEC.encode(xs))[None]
    got_l = np.asarray(MX.ntt256(SPEC, x)).reshape(n, F.LIMBS)
    got = [SPEC.from_mont_host(v) for v in F.limbs_to_ints(got_l)]
    want = [sum(xs[i] * pow(omega, i * k, P) for i in range(n)) % P
            for k in range(n)]
    assert got == want


def test_dft_matmul_extreme_inputs():
    # all-(p-1) inputs maximize every accumulator column
    n = 16
    w = [[P - 1] * n for _ in range(n)]
    dft = MX.DftMatmul(SPEC, w)
    xs = [P - 1] * n
    x = jnp.asarray(SPEC.encode(xs))[None]
    got = [SPEC.from_mont_host(v)
           for v in F.limbs_to_ints(np.asarray(dft(x)).reshape(n, F.LIMBS))]
    want = [(n * (P - 1) * (P - 1)) % P] * n
    assert got == want
