"""Transcript serialization + Fiat-Shamir conventions; pairing sanity."""

import random

import pytest

from halo2_aes_tpu.backend import pairing as PR
from halo2_aes_tpu.backend import poly as P
from halo2_aes_tpu.backend import transcript as T
from halo2_aes_tpu.ops import curve as CV
from halo2_aes_tpu.ops.field import FR

G = (CV.G1_X, CV.G1_Y)


def test_point_roundtrip():
    rng = random.Random(3)
    for _ in range(8):
        pt = CV.py_mul(G, rng.randrange(1, FR.modulus))
        assert T.point_from_bytes(T.point_to_bytes(pt)) == pt
    assert T.point_from_bytes(T.point_to_bytes(None)) is None


def test_writer_reader_agree():
    pt = CV.py_mul(G, 12345)
    w = T.TranscriptWriter()
    w.write_scalar(42)
    w.write_point(pt)
    c1 = w.squeeze_challenge()
    w.write_scalar(c1)
    proof = w.finalize()

    r = T.TranscriptReader(proof)
    assert r.read_scalar() == 42
    assert r.read_point() == pt
    c2 = r.squeeze_challenge()
    assert c1 == c2
    assert r.read_scalar() == c1
    r.assert_consumed()


def test_challenges_depend_on_absorbed_data():
    w1, w2 = T.TranscriptWriter(), T.TranscriptWriter()
    w1.write_scalar(1)
    w2.write_scalar(2)
    assert w1.squeeze_challenge() != w2.squeeze_challenge()
    # squeeze mutates state: consecutive squeezes differ
    a = w1.squeeze_challenge()
    assert a != w1.squeeze_challenge()


def test_truncated_proof_rejected():
    w = T.TranscriptWriter()
    w.write_scalar(7)
    r = T.TranscriptReader(w.finalize()[:16])
    with pytest.raises(ValueError):
        r.read_scalar()


def test_poly_host_helpers():
    pts = [3, 5, 9]
    evs = [10, 20, 31]
    coeffs = P.lagrange_interp_host(pts, evs)
    for x, y in zip(pts, evs):
        assert P.eval_host(coeffs, x) == y
    z = P.vanishing_poly_coeffs(pts)
    for x in pts:
        assert P.eval_host(z, x) == 0
    assert P.eval_host(z, 4) != 0


def test_pairing_bilinearity():
    e1 = PR.pairing(CV.py_mul(G, 6), PR.g2_mul(PR.G2, 7))
    e2 = PR.pairing(CV.py_mul(G, 42), PR.G2)
    e3 = PR.pairing(CV.py_mul(G, 7), PR.g2_mul(PR.G2, 6))
    assert e1 == e2 == e3
    assert e1 != PR.FQ12_ONE


def test_lagrange_evals_host():
    from halo2_aes_tpu.ops.ntt import domain

    k = 4
    dom = domain(FR, k)
    x = 987654321
    ls = P.lagrange_evals_host(k, x, range(1 << k))
    # sum of all lagrange basis polys = 1
    assert sum(ls) % FR.modulus == 1
    # interpolation of w^j values gives x
    w = dom.omega
    got = sum(pow(w, j, FR.modulus) * l for j, l in enumerate(ls)) % FR.modulus
    assert got == x % FR.modulus
