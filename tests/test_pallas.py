"""Pallas mont_mul kernel vs the XLA path (TPU only; skipped on CPU —
scripts/pallas_check.py runs it on the real chip)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_aes_tpu.ops import field as F

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="pallas kernel targets TPU"
)


def test_pallas_matches_xla():
    from halo2_aes_tpu.ops import pallas_field as PF

    rng = random.Random(3)
    n = 1 << 13
    a = jnp.asarray(F.ints_to_limbs_fast(
        [rng.randrange(F.FR.modulus) for _ in range(n)]))
    b = jnp.asarray(F.ints_to_limbs_fast(
        [rng.randrange(F.FR.modulus) for _ in range(n)]))
    PF.set_enabled(True)
    out_p = np.asarray(PF.mont_mul(F.FR, a, b))
    out_x = np.asarray(F.mont_mul(F.FR, a, b))
    np.testing.assert_array_equal(out_p, out_x)
    # edge values: 0, 1, p-1 (padded into a full block)
    edges = [0, 1, F.FR.modulus - 1] * (n // 3) + [0] * (n % 3)
    e = jnp.asarray(F.ints_to_limbs_fast(edges))
    np.testing.assert_array_equal(
        np.asarray(PF.mont_mul(F.FR, e, b)), np.asarray(F.mont_mul(F.FR, e, b))
    )
