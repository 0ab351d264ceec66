"""G1 Jacobian arithmetic vs the python-bigint oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_aes_tpu.ops import curve as CV
from halo2_aes_tpu.ops import field as F

G = (CV.G1_X, CV.G1_Y)


def rand_points(rng, n):
    pts = [CV.py_mul(G, int(rng.integers(1, 1 << 60))) for _ in range(n)]
    assert all(CV.py_is_on_curve(p) for p in pts)
    return pts


def to_jac(pts):
    return CV.affine_to_jacobian(CV.affine_from_ints(pts))


def test_add_double_match_oracle():
    rng = np.random.default_rng(7)
    a = rand_points(rng, 8)
    b = rand_points(rng, 8)
    out = jax.jit(CV.add)(to_jac(a), to_jac(b))
    assert CV.to_affine_host(out) == [CV.py_add(p, q) for p, q in zip(a, b)]

    dbl = jax.jit(CV.double)(to_jac(a))
    assert CV.to_affine_host(dbl) == [CV.py_add(p, p) for p in a]


def test_add_special_cases():
    p = rand_points(np.random.default_rng(3), 1)
    jac = to_jac(p)
    ident = CV.identity()

    # P + P falls through to doubling inside the complete adder
    assert CV.to_affine_host(CV.add(jac, jac)) == [CV.py_add(p[0], p[0])]
    # P + (-P) = identity
    assert CV.to_affine_host(CV.add(jac, CV.neg(jac)))[0] is None
    # identity on either side
    one = lambda t: tuple(c[0] for c in t)
    assert CV.to_affine_host(CV.add(ident, one(jac))) == [p[0]]
    assert CV.to_affine_host(CV.add(one(jac), ident)) == [p[0]]
    assert CV.to_affine_host(CV.double(ident))[0] is None


def test_oracle_generator_order():
    # r * G = identity (G1 has prime order r = Fr modulus)
    assert CV.py_mul(G, F.FR.modulus) is None
