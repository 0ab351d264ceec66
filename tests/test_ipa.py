"""IPA backend: transparent setup + prove/verify round trip.

The reference swaps its ENTIRE proving system behind a feature flag
(reference src/lib.rs:10-13, Cargo.toml:6-11); ``get_backend("ipa")``
is this repo's analog — a second proving SYSTEM (transparent basis, no
pairings, log-n opening recursion), not a second multiopen mode."""

import numpy as np
import pytest

from halo2_aes_tpu.backend import get_backend
from halo2_aes_tpu.backend import ipa as IPA
from halo2_aes_tpu.backend.keygen import keygen
from halo2_aes_tpu.backend.prover import prove
from halo2_aes_tpu.backend.verifier import VerifyError
from halo2_aes_tpu.ops import curve as CV

from tests.test_prove_verify import K, toy_circuit


def test_basis_points_on_curve_and_deterministic():
    srs = IPA.setup(4, cache_dir=None)
    assert srs.n == 16 and srs.g1_extra is None
    pts = [IPA._mont_limbs_to_point(np.asarray(srs.g1_x[i]),
                                    np.asarray(srs.g1_y[i]))
           for i in range(srs.n)]
    for p in pts + [srs.u_pt]:
        assert CV.py_is_on_curve(p)
    assert len(set(pts + [srs.u_pt])) == srs.n + 1
    again = IPA.setup(4, cache_dir=None)
    assert again.u_pt == srs.u_pt
    assert np.array_equal(np.asarray(again.g1_x), np.asarray(srs.g1_x))
    # a different seed yields a different basis
    other = IPA.setup(4, seed=b"other", cache_dir=None)
    assert other.u_pt != srs.u_pt


@pytest.fixture(scope="module")
def ipa_setup():
    layout, values = toy_circuit()
    srs = IPA.setup(K, cache_dir=None)
    pk = keygen(layout, srs)
    return layout, values, pk, srs


@pytest.mark.slow
def test_ipa_roundtrip(ipa_setup):
    layout, values, pk, srs = ipa_setup
    proof = prove(pk, values, seed=42, multiopen="ipa")
    assert IPA.verify(pk.vk, proof, srs=srs)
    # the cost model's proof-size estimate is exact for ipa too
    from halo2_aes_tpu.utils import cost_model

    assert len(proof) == cost_model.estimate(layout,
                                             multiopen="ipa").proof_bytes
    # different blinding seed still verifies; proof carries the 2k
    # opening rounds + final scalar instead of the KZG witness commit
    assert IPA.verify(pk.vk, prove(pk, values, seed=43, multiopen="ipa"),
                      srs=srs)


@pytest.mark.slow
def test_ipa_rejects_tampering(ipa_setup):
    _, values, pk, srs = ipa_setup
    proof = prove(pk, values, seed=7, multiopen="ipa")
    # flip the final folded scalar (last 32 bytes)
    bad = bytearray(proof)
    bad[-1] ^= 1
    with pytest.raises(VerifyError):
        IPA.verify(pk.vk, bytes(bad), srs=srs)
    # flip an advice commitment byte near the front
    bad = bytearray(proof)
    bad[5] ^= 1
    with pytest.raises(VerifyError):
        IPA.verify(pk.vk, bytes(bad), srs=srs)
    # truncated proof
    with pytest.raises(VerifyError):
        IPA.verify(pk.vk, proof[:-40], srs=srs)


@pytest.mark.slow
def test_ipa_proof_rejected_by_kzg_verifier(ipa_setup):
    _, values, pk, srs = ipa_setup
    from halo2_aes_tpu.backend.verifier import verify as kzg_verify

    proof = prove(pk, values, seed=9, multiopen="ipa")
    with pytest.raises(VerifyError):
        kzg_verify(pk.vk, proof)


def test_backend_registry_exposes_ipa():
    b = get_backend("ipa")
    assert b.name == "ipa"
    assert b.setup_srs is IPA.setup and b.verify is IPA.verify
    with pytest.raises(KeyError):
        get_backend("nope")
