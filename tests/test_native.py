"""Native C++ host backend (halo2_aes_tpu/native): differential tests
against the python-bigint oracle it mirrors (ops/curve.py py_*,
backend/pairing.py)."""

import random

import pytest

from halo2_aes_tpu import native
from halo2_aes_tpu.backend import pairing as PR
from halo2_aes_tpu.ops import curve as CV

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native backend unavailable (no g++ or self-test failed)")

G1 = (CV.G1_X, CV.G1_Y)
RNG = random.Random(99)


def test_msm_differential():
    for trial in range(4):
        ks = [RNG.randrange(PR.R) for _ in range(3)]
        pts = [CV.py_mul(G1, k + 1) for k in ks]
        expect = None
        for p, k in zip(pts, ks):
            expect = CV.py_add(expect, CV.py_mul(p, k))
        assert native.g1_msm(pts, ks) == expect, trial


def test_msm_edge_cases():
    assert native.g1_msm([], []) is None
    assert native.g1_msm([G1, None], [0, 5]) is None
    assert native.g1_msm([G1], [1]) == G1
    assert native.g1_msm([G1], [PR.R - 1]) == CV.py_mul(G1, PR.R - 1)
    # r * P = identity; P + (r-1) P = identity
    assert native.g1_msm([G1, G1], [1, PR.R - 1]) is None


def test_host_msm_matches_python_fold():
    ks = [0, 1, RNG.randrange(PR.R), PR.R - 2]
    pts = [CV.py_mul(G1, k + 2) for k in ks]
    expect = None
    for p, k in zip(pts, ks):
        if k:
            expect = CV.py_add(expect, CV.py_mul(p, k))
    assert CV.host_msm(pts, ks) == expect


def test_pairing_bilinearity():
    a = RNG.randrange(1, PR.R)
    aP = CV.py_mul(G1, a)
    aQ = PR.g2_mul(PR.G2, a)
    negP = (G1[0], -G1[1] % PR.Q)
    assert native.pairing_product_is_one([(aP, PR.G2), (negP, aQ)])
    assert not native.pairing_product_is_one([(aP, PR.G2), (G1, aQ)])
    # infinity pairs contribute 1
    assert native.pairing_product_is_one(
        [(aP, PR.G2), (None, PR.G2), (negP, aQ), (aP, None)])


def test_pairing_matches_python_oracle():
    """Same verdicts as the pure-python Miller loop on random inputs."""
    a, b = RNG.randrange(1, 1000), RNG.randrange(1, 1000)
    aP, bQ = CV.py_mul(G1, a), PR.g2_mul(PR.G2, b)
    negabP = CV.py_mul(G1, (-a * b) % PR.R)
    pairs_good = [(aP, bQ), (negabP, PR.G2)]
    pairs_bad = [(aP, bQ), (CV.py_mul(G1, 7), PR.G2)]
    f_good = PR.FQ12_ONE
    f_bad = PR.FQ12_ONE
    for p, q in pairs_good:
        f_good = PR.fq12_mul(f_good, PR.miller_loop(q, p))
    for p, q in pairs_bad:
        f_bad = PR.fq12_mul(f_bad, PR.miller_loop(q, p))
    assert (PR.final_exponentiation(f_good) == PR.FQ12_ONE) == \
        native.pairing_product_is_one(pairs_good) is True
    assert (PR.final_exponentiation(f_bad) == PR.FQ12_ONE) == \
        native.pairing_product_is_one(pairs_bad) is False
