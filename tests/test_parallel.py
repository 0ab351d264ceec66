"""Multi-device sharding: four-step NTT and point-sharded MSM on the
8-device CPU mesh (SURVEY.md section 5.7-5.8 capabilities)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from halo2_aes_tpu.ops import curve as CV
from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops import msm as M
from halo2_aes_tpu.ops import ntt as NTT
from halo2_aes_tpu.parallel import msm as PMSM
from halo2_aes_tpu.parallel import ntt as PNTT


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh "
                    "(HALO2_TEST_DEVICE=tpu runs single-chip)")
    return Mesh(np.array(devs[:8]), axis_names=("dp",))


def test_ntt_sharded_matches_serial(mesh):
    k = 8
    dom = NTT.domain(F.FR, k)
    coeffs = jnp.asarray(F.FR.encode(list(range(1 << k))))
    expect = NTT.ntt(dom, coeffs)
    got = PNTT.ntt_sharded(mesh, "dp", dom, coeffs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
    back = PNTT.ntt_sharded(mesh, "dp", dom, got, inverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coeffs))


def test_msm_sharded_matches_oracle(mesh):
    n = 64
    rng = random.Random(5)
    G = (CV.G1_X, CV.G1_Y)
    pts = [CV.py_mul(G, rng.randrange(1, 1 << 48)) for _ in range(n)]
    scalars = [rng.randrange(F.FR.modulus) for _ in range(n)]
    out = PMSM.msm_sharded(
        mesh, "dp", CV.affine_from_ints(pts), F.ints_to_limbs_fast(scalars), c=4
    )
    assert CV.to_affine_host(out)[0] == M.msm_host(pts, scalars)


@pytest.mark.slow
def test_sharded_prove_verify_roundtrip():
    """Full prove with mesh-sharded NTTs (all-to-all) and collective
    MSMs (all-gather) verifies against the unchanged host verifier —
    the prover's multi-chip path end-to-end (SURVEY.md section 5.7-5.8)."""
    from tests.test_prove_verify import toy_circuit
    from halo2_aes_tpu.backend import srs as SRS
    from halo2_aes_tpu.backend.keygen import keygen
    from halo2_aes_tpu.backend.prover import prove
    from halo2_aes_tpu.backend.verifier import verify

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
    layout, values = toy_circuit()
    srs = SRS.setup(layout.k, cache_dir=None)
    pk = keygen(layout, srs)
    proof = prove(pk, values, seed=11, mesh=mesh, mesh_axis="dp")
    assert verify(pk.vk, proof)
    # sharded and single-device provers share one transcript protocol:
    # same blinding seed -> byte-identical proofs
    assert proof == prove(pk, values, seed=11)
