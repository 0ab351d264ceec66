"""Pippenger MSM vs the python-bigint oracle."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from halo2_aes_tpu.ops import curve as CV
from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops import msm as M

G = (CV.G1_X, CV.G1_Y)


def test_digit_matrix_reassembles_scalar():
    rng = np.random.default_rng(5)
    vals = [int(rng.integers(0, 1 << 63)) << s for s in (0, 64, 128, 190)]
    vals += [0, 1, F.FR.modulus - 1]
    limbs = F.ints_to_limbs_fast(vals)
    for c in (4, 11, 13):
        digs = np.asarray(M.digit_matrix(limbs, c))
        got = [
            sum(int(digs[w, i]) << (w * c) for w in range(digs.shape[0]))
            for i in range(len(vals))
        ]
        assert got == vals


def test_msm_matches_oracle():
    import random

    rng = np.random.default_rng(11)
    pyrng = random.Random(11)
    n = 32
    pts = [CV.py_mul(G, int(rng.integers(1, 1 << 61))) for _ in range(n)]
    scalars = [pyrng.randrange(F.FR.modulus) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = F.FR.modulus - 1
    scalars[2] = 1

    out = jax.jit(lambda p, s: M.msm(p, s, c=6))(
        CV.affine_from_ints(pts), F.ints_to_limbs_fast(scalars)
    )
    assert CV.to_affine_host(out)[0] == M.msm_host(pts, scalars)


def test_msm_all_zero_scalars_is_identity():
    pts = [CV.py_mul(G, i + 1) for i in range(4)]
    out = M.msm(CV.affine_from_ints(pts), F.ints_to_limbs_fast([0, 0, 0, 0]), c=5)
    assert CV.to_affine_host(out)[0] is None


def test_msm_adversarial_digit_distributions():
    """Cases that stress the tree MSM's complete adder: equal scalars
    (every tree level doubles), repeated points, byte-ranged scalars
    (all high windows empty), and a non-power-of-two length."""
    import random

    pyrng = random.Random(7)
    pts = [CV.py_mul(G, i + 3) for i in range(8)]
    # one shape (n=8) for three digit distributions + one non-pow2 (n=6):
    # XLA-CPU compiles ~90s per distinct shape on this host
    cases = [
        (pts, [5] * 8),                                       # all equal
        ([pts[0]] * 8, [pyrng.randrange(F.FR.modulus) for _ in range(8)]),
        (pts, [pyrng.randrange(256) for _ in range(8)]),      # byte data
        (pts[:6], [0, 0, 3, 3, 0, F.FR.modulus - 2]),         # pad to 8
    ]
    for pts, scalars in cases:
        out = M.msm(CV.affine_from_ints(pts), F.ints_to_limbs_fast(scalars), c=5)
        assert CV.to_affine_host(out)[0] == M.msm_host(pts, scalars)


def test_msm_default_window_reasonable():
    for n in (1 << 10, 1 << 17, 1 << 20):
        c = M.default_window(n)
        assert 6 <= c <= 16
        assert c + max(1, int(np.ceil(np.log2(n)))) <= 32


def test_msm_tables_path_matches_oracle():
    """Window-shifted table MSM (the SRS commit path: no Horner chain)."""
    import random

    pyrng = random.Random(5)
    pts = [CV.py_mul(G, i + 2) for i in range(8)]
    scalars = [pyrng.randrange(F.FR.modulus) for _ in range(8)]
    scalars[0] = 0
    pa = CV.affine_from_ints(pts)
    sl = F.ints_to_limbs_fast(scalars)
    tabs = M.build_tables(pa, 5)
    out = M.msm(pa, sl, c=5, tables=tabs)
    assert CV.to_affine_host(out)[0] == M.msm_host(pts, scalars)


def test_msm_many_matches_oracle():
    """Batched multi-commitment MSM (the prover's one-dispatch commit
    path) against the host oracle, including an all-zero commitment
    (identity result) and a padded short poly."""
    import random

    import jax.numpy as jnp

    pyrng = random.Random(9)
    pts = [CV.py_mul(G, i + 3) for i in range(8)]
    pa = CV.affine_from_ints(pts)
    tabs = jnp.asarray(M.build_tables(pa, 5))
    count = 3
    scal = [[pyrng.randrange(F.FR.modulus) for _ in range(8)],
            [0] * 8,
            [pyrng.randrange(256) for _ in range(8)]]
    flat = F.ints_to_limbs_fast([s for row in scal for s in row])
    stack = M.msm_many(pa, jnp.asarray(flat), count, 5, tabs)
    got = CV.to_affine_host((stack[0], stack[1], stack[2]))
    for i in range(count):
        assert got[i] == M.msm_host(pts, scal[i]), i
