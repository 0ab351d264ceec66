"""End-to-end prove -> verify round trip on a toy circuit.

Covers the full backend: keygen (fixed/sigma commitments), lookup
permuted pairs + products, permutation grand products, quotient,
evaluations, SHPLONK multiopen, pairing verification — plus negative
tests (the reference has none, SURVEY.md section 4 gaps)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from halo2_aes_tpu.backend import srs as SRS
from halo2_aes_tpu.backend.keygen import keygen
from halo2_aes_tpu.backend.prover import prove
from halo2_aes_tpu.backend.verifier import VerifyError, verify
from halo2_aes_tpu.circuit.ir import CompiledCircuit, ConstraintSystem, Prod, Ref, Sum, Neg

K = 6
N = 1 << K


def toy_circuit():
    """q_add * (a0 + a1 - a2) gate; (a0, a1) lookup into (i, 7i mod 256);
    one copy constraint a2[2] == a0[5]."""
    cs = ConstraintSystem()
    q_add = cs.fixed_column("q_add")
    q_lk = cs.fixed_column("q_lk")
    t_in = cs.fixed_column("t_in")
    t_out = cs.fixed_column("t_out")
    a0 = cs.advice_column("a0")
    a1 = cs.advice_column("a1")
    a2 = cs.advice_column("a2")
    cs.create_gate("add", Prod(Ref(q_add), Sum(Sum(Ref(a0), Ref(a1)), Neg(Ref(a2)))))
    cs.add_lookup("mul7", [(Prod(Ref(q_lk), Ref(a0)), t_in),
                           (Prod(Ref(q_lk), Ref(a1)), t_out)])
    for c in (a0, a1, a2):
        cs.enable_equality(c)

    fixed = np.zeros((7, N), dtype=np.uint32)
    fixed[t_in, :32] = np.arange(32)
    fixed[t_out, :32] = (np.arange(32) * 7) % 256

    values = np.zeros((7, N), dtype=np.uint32)
    # lookup rows
    for row, x in [(0, 3), (1, 5), (10, 31)]:
        fixed[q_lk, row] = 1
        values[a0, row] = x
        values[a1, row] = (x * 7) % 256
    # gate rows
    fixed[q_add, 2] = 1
    values[a0, 2], values[a1, 2], values[a2, 2] = 2, 3, 5
    # copy a2[2] == a0[5]
    values[a0, 5] = 5
    copy_pairs = np.array([[a2, 2, a0, 5]], dtype=np.int32)

    layout = CompiledCircuit(
        k=K, cs=cs, fixed=fixed,
        witness_map=np.full((7, N), -1, np.int32),
        copy_pairs=copy_pairs, pool_len=0,
    )
    values += fixed  # merged matrix as assemble_values would produce
    return layout, values


@pytest.fixture(scope="module")
def setup():
    layout, values = toy_circuit()
    srs = SRS.setup(K, cache_dir=None)
    pk = keygen(layout, srs)
    return layout, values, pk


def test_roundtrip(setup):
    layout, values, pk = setup
    proof = prove(pk, values, seed=42)
    assert verify(pk.vk, proof)
    # different blinding seed still verifies
    assert verify(pk.vk, prove(pk, values, seed=43))
    # the cost model's proof-size estimate is exact
    from halo2_aes_tpu.utils import cost_model

    assert cost_model.estimate(layout).proof_bytes == len(proof)


def test_bad_witness_rejected(setup):
    layout, values, pk = setup
    bad = values.copy()
    bad[6, 2] = 6  # a2: 2 + 3 != 6
    proof = prove(pk, bad, seed=1)
    with pytest.raises(VerifyError):
        verify(pk.vk, proof)


def test_bad_lookup_rejected(setup):
    layout, values, pk = setup
    bad = values.copy()
    bad[5, 0] = 22  # a1: 22 != 3*7
    proof = prove(pk, bad, seed=1)
    with pytest.raises(VerifyError):
        verify(pk.vk, proof)


def test_bad_copy_rejected(setup):
    layout, values, pk = setup
    bad = values.copy()
    bad[4, 5] = 9  # breaks a2[2] == a0[5]
    proof = prove(pk, bad, seed=1)
    with pytest.raises(VerifyError):
        verify(pk.vk, proof)


def test_corrupt_proof_rejected(setup):
    layout, values, pk = setup
    proof = bytearray(prove(pk, values, seed=2))
    proof[-1] ^= 1
    with pytest.raises(VerifyError):
        verify(pk.vk, bytes(proof))


def test_degree4_circuit_zero_top_piece():
    """d=4 circuit: the extended domain has 4n slots but only d-1=3 live
    quotient pieces — the prover must commit exactly 3 (the 4th would be
    the identity point) and the verifier must agree.  Regression for the
    ratio-vs-(d-1) piece-count bug (ADVICE.md round 1)."""
    cs = ConstraintSystem()
    q = cs.fixed_column("q")
    a0 = cs.advice_column("a0")
    a1 = cs.advice_column("a1")
    a2 = cs.advice_column("a2")
    # q * (a0*a1*a2 - a0) : degree 4
    cs.create_gate("cube", Prod(Ref(q), Sum(
        Prod(Prod(Ref(a0), Ref(a1)), Ref(a2)), Neg(Ref(a0)))))
    cs.enable_equality(a0)
    cs.enable_equality(a1)
    assert cs.degree() == 4

    fixed = np.zeros((4, N), dtype=np.uint32)
    values = np.zeros((4, N), dtype=np.uint32)
    fixed[q, 1] = 1
    values[a0, 1], values[a1, 1], values[a2, 1] = 9, 4, 12  # 9*4*12 = 432
    values[a0, 1] = 0  # 0*..*.. - 0 = 0 satisfies trivially
    layout = CompiledCircuit(
        k=K, cs=cs, fixed=fixed,
        witness_map=np.full((4, N), -1, np.int32),
        copy_pairs=np.zeros((0, 4), np.int32), pool_len=0,
    )
    values += fixed
    srs = SRS.setup(K, cache_dir=None)
    pk = keygen(layout, srs)
    proof = prove(pk, values, seed=3)
    from halo2_aes_tpu.utils import cost_model

    assert cost_model.estimate(layout).proof_bytes == len(proof)
    assert verify(pk.vk, proof)


def test_keygen_cache_keyed_by_srs_identity(tmp_path):
    """A same-k SRS with a different tau must MISS the pk cache —
    aliasing would silently pair stale commitments with a fresh SRS and
    fail every honest proof (ADVICE.md round 1)."""
    from halo2_aes_tpu.backend.keygen import keygen_cached, srs_identity

    layout, _ = toy_circuit()
    srs_a = SRS.setup(K, seed=b"srs-a", cache_dir=None)
    srs_b = SRS.setup(K, seed=b"srs-b", cache_dir=None)
    assert srs_identity(srs_a) != srs_identity(srs_b)
    pk_a = keygen_cached(layout, srs_a, cache_dir=str(tmp_path))
    pk_b = keygen_cached(layout, srs_b, cache_dir=str(tmp_path))
    assert pk_a.vk.fixed_commitments != pk_b.vk.fixed_commitments
    # cache HIT on the same identity reproduces the commitments
    pk_a2 = keygen_cached(layout, srs_a, cache_dir=str(tmp_path))
    assert pk_a2.vk.fixed_commitments == pk_a.vk.fixed_commitments
    assert pk_a2.vk.digest == pk_a.vk.digest


def test_tagged_op_lookup_roundtrip():
    """A lookup whose tag comes from a fixed column (the decryption
    circuit's leaner design, models/chips.py DecChipSet) proves and
    verifies; a value from the WRONG sub-table is rejected."""
    cs = ConstraintSystem()
    q = cs.fixed_column("q_op")
    tag_col = cs.fixed_column("op_tag")
    t_tag = cs.fixed_column("t_tag")
    t_in = cs.fixed_column("t_in")
    t_out = cs.fixed_column("t_out")
    a0 = cs.advice_column("a0")
    a1 = cs.advice_column("a1")
    cs.add_lookup("tagged op", [(Prod(Ref(q), Ref(tag_col)), t_tag),
                                (Prod(Ref(q), Ref(a0)), t_in),
                                (Prod(Ref(q), Ref(a1)), t_out)])
    cs.enable_equality(a0)

    # two sub-tables: tag 1 -> y = 2x, tag 2 -> y = 3x (x < 16)
    fixed = np.zeros((7, N), dtype=np.uint32)
    fixed[t_tag, 0:16], fixed[t_in, 0:16] = 1, np.arange(16)
    fixed[t_out, 0:16] = np.arange(16) * 2
    fixed[t_tag, 16:32], fixed[t_in, 16:32] = 2, np.arange(16)
    fixed[t_out, 16:32] = (np.arange(16) * 3) % 256

    values = np.zeros((7, N), dtype=np.uint32)
    for row, tag, x in [(0, 1, 5), (1, 2, 5), (2, 1, 15)]:
        fixed[q, row] = 1
        fixed[tag_col, row] = tag
        values[a0, row] = x
        values[a1, row] = (x * 2 if tag == 1 else x * 3) % 256

    layout = CompiledCircuit(
        k=K, cs=cs, fixed=fixed,
        witness_map=np.full((7, N), -1, np.int32),
        copy_pairs=np.zeros((0, 4), np.int32), pool_len=0,
    )
    values += fixed
    srs = SRS.setup(K, cache_dir=None)
    pk = keygen(layout, srs)
    proof = prove(pk, values, seed=11)
    assert verify(pk.vk, proof)
    # row 1 is tag 2 (y=3x): the tag-1 answer 2x must be rejected
    bad = values.copy()
    bad[6, 1] = 10
    with pytest.raises(VerifyError):
        verify(pk.vk, prove(pk, bad, seed=12))


def test_checkpoint_resume(setup, tmp_path, monkeypatch):
    """Crash-restartable proving (SURVEY.md §5.3): a prove killed after
    the grand-product phase resumes at the quotient phase, replays the
    Fiat-Shamir absorbs from saved commitment points, and produces a
    byte-identical proof; success clears the checkpoint."""
    from halo2_aes_tpu.backend import resume as RES
    from halo2_aes_tpu.backend import prover as PRV

    layout, values, pk = setup
    baseline = prove(pk, values, seed=7)

    # inject a crash immediately after the "products" phase checkpoint
    # lands on disk
    orig_save = RES.ProveCheckpoint.save

    def crashing_save(self, phase, arrays, points, rng=None):
        orig_save(self, phase, arrays, points, rng)
        if phase == "products":
            raise RuntimeError("injected crash")

    monkeypatch.setattr(RES.ProveCheckpoint, "save", crashing_save)
    with pytest.raises(RuntimeError, match="injected crash"):
        prove(pk, values, seed=7, checkpoint_dir=str(tmp_path))
    monkeypatch.setattr(RES.ProveCheckpoint, "save", orig_save)

    # the resumed prove must NOT recompute phases 1-3: poison them
    ph = PRV._get_phases(pk)

    def boom(*a, **k):
        raise AssertionError("restored phase was recomputed")

    monkeypatch.setattr(ph, "advice_phase", boom)
    monkeypatch.setattr(ph, "lookup_phase", boom)
    monkeypatch.setattr(ph, "perm_products", boom)
    resumed = prove(pk, values, seed=7, checkpoint_dir=str(tmp_path))
    assert resumed == baseline
    assert verify(pk.vk, resumed)
    # completion clears every phase file
    for d in tmp_path.iterdir():
        assert not list(d.iterdir())


def test_checkpoint_keyed_on_inputs(setup, tmp_path):
    """A checkpoint directory written for one (witness, seed) must never
    be spliced into a prove of different inputs."""
    from halo2_aes_tpu.backend import resume as RES

    layout, values, pk = setup
    a = RES.ProveCheckpoint(
        str(tmp_path), RES.prove_key_material(pk.vk.digest, values, [], 7,
                                              "shplonk"))
    b = RES.ProveCheckpoint(
        str(tmp_path), RES.prove_key_material(pk.vk.digest, values, [], 8,
                                              "shplonk"))
    assert a.dir != b.dir
    bad = values.copy()
    bad[6, 2] ^= 1
    c = RES.ProveCheckpoint(
        str(tmp_path), RES.prove_key_material(pk.vk.digest, bad, [], 7,
                                              "shplonk"))
    assert c.dir != a.dir


def test_sanitized_prove_and_determinism(setup, monkeypatch):
    """With HALO2_SANITIZE=1 an honest prove passes every phase-boundary
    canonicity check, and seeded proves are byte-deterministic (the
    transcript-determinism assert of SURVEY.md §5.2); unseeded proves
    draw CSPRNG blinding and must differ."""
    layout, values, pk = setup
    monkeypatch.setenv("HALO2_SANITIZE", "1")
    a = prove(pk, values, seed=99)
    assert verify(pk.vk, a)
    monkeypatch.delenv("HALO2_SANITIZE")
    assert prove(pk, values, seed=99) == a
    assert prove(pk, values) != prove(pk, values)


def test_batch_verify(setup):
    """verify_batch folds N proofs into ONE pairing-product check (the
    serving path for proof bundles) and rejects a batch containing a
    single dishonest proof."""
    from halo2_aes_tpu.backend.verifier import verify_batch

    layout, values, pk = setup
    proofs = [prove(pk, values, seed=s) for s in (31, 32, 33)]
    assert verify_batch(pk.vk, proofs)
    assert verify_batch(pk.vk, [])
    # one bad-witness proof poisons the whole batch (combined pairing)
    bad = values.copy()
    bad[6, 2] = 6
    with pytest.raises(VerifyError):
        verify_batch(pk.vk, proofs + [prove(pk, bad, seed=34)])
    # a malformed transcript is attributed to its batch index
    # (truncated: replay hits end-of-proof; a bit flip may parse and
    # only fail the combined pairing, which has no attribution)
    with pytest.raises(VerifyError, match="proof 1"):
        verify_batch(pk.vk, [proofs[0], proofs[1][:-8]])


def test_second_backend_gwc_roundtrip(setup):
    """The backend seam carries a real second proving backend: the same
    circuit/pk proves and verifies through the kzg-gwc registry entry
    (plonk-style multiopen), with its own exact proof size, and the two
    backends' proofs are not interchangeable.  Role of the reference's
    compile-time backend switch (src/lib.rs:10-13)."""
    from halo2_aes_tpu.backend import get_backend
    from halo2_aes_tpu.utils import cost_model

    layout, values, pk = setup
    gwc = get_backend("kzg-gwc")
    proof = gwc.prove(pk, values, seed=21)
    assert gwc.verify(pk.vk, proof)
    assert cost_model.estimate(layout, multiopen="gwc").proof_bytes == len(proof)
    # a GWC proof must NOT verify under the SHPLONK verifier
    shp = get_backend("kzg-shplonk")
    with pytest.raises(VerifyError):
        shp.verify(pk.vk, proof)
    # corrupt witness -> GWC verifier rejects
    bad = values.copy()
    bad[6, 2] = 6
    with pytest.raises(VerifyError):
        gwc.verify(pk.vk, gwc.prove(pk, bad, seed=22))


def test_degenerate_quotient_blinded_no_identity_on_wire():
    """A circuit whose quotient polynomial is identically ZERO (one gate,
    satisfied with all-zero advice: the numerator vanishes everywhere,
    including the blinding rows where q=0).  Without the staggered piece
    blinds every quotient-piece commitment would be the identity point —
    which the transcript now REJECTS (halo2 panic semantics, reference
    src/main.rs:92).  The blinds must both keep the wire identity-free
    and keep the proof verifying; both multiopen backends are covered.
    """
    cs = ConstraintSystem()
    q = cs.fixed_column("q")
    a0 = cs.advice_column("a0")
    cs.create_gate("zero", Prod(Ref(q), Ref(a0)))

    fixed = np.zeros((2, N), dtype=np.uint32)
    fixed[q, 1] = 1
    values = np.zeros((2, N), dtype=np.uint32)
    layout = CompiledCircuit(
        k=K, cs=cs, fixed=fixed,
        witness_map=np.full((2, N), -1, np.int32),
        copy_pairs=np.zeros((0, 4), np.int32), pool_len=0,
    )
    values += fixed
    srs = SRS.setup(K, cache_dir=None)
    assert srs.g1_extra is not None
    pk = keygen(layout, srs)
    for backend in ("shplonk", "gwc"):
        proof = prove(pk, values, seed=11, multiopen=backend)
        assert verify(pk.vk, proof, multiopen=backend)
        # identity encodes as 32 zero bytes; every wire item is one
        # 32-byte word and none may be all-zero (scalars here are
        # challenge-mixed evals, zero w.p. ~2^-254)
        assert all(proof[i:i + 32] != bytes(32)
                   for i in range(0, len(proof), 32))
        # different blinds -> different piece commitments, same verdict
        proof2 = prove(pk, values, seed=12, multiopen=backend)
        assert proof2 != proof
        assert verify(pk.vk, proof2, multiopen=backend)


def test_transcript_wire_rejects_identity():
    from halo2_aes_tpu.backend.transcript import (
        TranscriptReader, TranscriptWriter)

    tr = TranscriptWriter()
    with pytest.raises(ValueError, match="identity"):
        tr.write_point(None)
    rd = TranscriptReader(bytes(32))
    with pytest.raises(ValueError, match="identity"):
        rd.read_point()


def test_sliced_subcoset_evals_match_monolithic(setup):
    """evals_sliced (the bounded-workspace k>=19 quotient path) must be
    value-identical to the monolithic stack NTT it replaces."""
    import jax.numpy as jnp

    from halo2_aes_tpu.backend import prover as PRV

    _, _, pk = setup
    ph = PRV._get_phases(pk)
    shift_np, _ = PRV._subcoset_tables_np(ph.k, ph.ext_k, 1)
    shift = jnp.asarray(shift_np)
    stack = jnp.concatenate([jnp.asarray(ph._coeffs_static(key))
                             for key in ph.q_static_keys])
    mono = ph.ntt_stack_static(stack, shift)
    sliced = ph.evals_sliced(ph.q_static_keys, ph._coeffs_static, shift,
                             B=2)   # forces full + remainder slices
    assert np.array_equal(np.asarray(mono), np.asarray(sliced))


def test_sliced_quotient_subcoset_matches_fused(setup):
    """quotient_subcoset_sliced (k>=19 bounded-live-set path) must be
    value-identical to the fused executable for arbitrary inputs."""
    import jax.numpy as jnp

    from halo2_aes_tpu.backend import prover as PRV
    from halo2_aes_tpu.ops import field as F

    _, _, pk = setup
    ph = PRV._get_phases(pk)
    n = ph.n
    FR = F.FR
    rng = np.random.default_rng(3)

    def rnd(rows):
        return jnp.asarray(FR.encode(
            rng.integers(1, 2**62, rows, dtype=np.int64).tolist()))

    static_evals = rnd(len(ph.q_static_keys) * n)
    dyn_evals = rnd(len(ph.q_dyn_keys) * n)
    theta, beta, gamma, y = (jnp.asarray(FR.encode(v))
                             for v in (11, 13, 17, 19))
    shift_np, zh_inv_np = PRV._subcoset_tables_np(ph.k, ph.ext_k, 1)
    shift = jnp.asarray(shift_np)
    zh_inv = jnp.asarray(zh_inv_np)
    fused = ph.quotient_subcoset(static_evals, dyn_evals, theta, beta,
                                 gamma, y, shift, zh_inv)
    sliced = ph.quotient_subcoset_sliced(static_evals, dyn_evals, theta,
                                         beta, gamma, y, shift, zh_inv,
                                         n_parts=3)
    assert np.array_equal(np.asarray(fused), np.asarray(sliced))


def test_split_quotient_finish_matches_monolithic(setup):
    """quotient_finish_large (the k>=19 four-step decomposition that
    avoids the remote-compile body cap) must be value-identical to the
    monolithic ext-domain interp."""
    import jax.numpy as jnp

    from halo2_aes_tpu.backend import prover as PRV
    from halo2_aes_tpu.ops import field as F

    _, _, pk = setup
    ph = PRV._get_phases(pk)
    rng = np.random.default_rng(5)
    q_flat = jnp.asarray(F.FR.encode(
        rng.integers(1, 2**62, ph.ratio * ph.n, dtype=np.int64).tolist()))
    mono = ph.quotient_finish(jnp.array(q_flat))       # donated: pass a copy
    split = ph.quotient_finish_large(jnp.array(q_flat))
    assert np.array_equal(np.asarray(mono), np.asarray(split))


def test_split_shplonk_h_matches_monolithic(setup):
    """shplonk_h_large (two size-n sub-coset passes) must be
    value-identical to the monolithic 2n-coset division."""
    import jax.numpy as jnp

    from halo2_aes_tpu.backend import poly as P
    from halo2_aes_tpu.backend import prover as PRV
    from halo2_aes_tpu.ops import field as F

    _, _, pk = setup
    ph = PRV._get_phases(pk)
    FR = F.FR
    rng = np.random.default_rng(7)
    zt = P.vanishing_poly_coeffs([3, 5, 7])
    zt_m = jnp.asarray(F.ints_to_limbs_fast(
        [FR.to_mont_host(c) for c in zt]))
    f_acc = jnp.asarray(FR.encode(rng.integers(
        1, 2**62, ph.n + len(zt) - 1, dtype=np.int64).tolist()))
    mono = ph.shplonk_h(f_acc, zt_m)
    split = ph.shplonk_h_large(f_acc, zt_m)
    assert np.array_equal(np.asarray(mono), np.asarray(split))


def test_chunked_shplonk_fold_matches_monolithic(setup):
    """shplonk_fold_large (the k>=19 chunked member fold that avoids
    the (M*n, 16) concat — the measured k=20/n_sets=2 OOM) must be
    value-identical to the monolithic weighted fold."""
    import jax.numpy as jnp

    from halo2_aes_tpu.backend import prover as PRV
    from halo2_aes_tpu.ops import field as F

    _, _, pk = setup
    ph = PRV._get_phases(pk)
    FR = F.FR
    rng = np.random.default_rng(11)
    M = sum(ph.shp_sizes)
    polys = {i: jnp.asarray(FR.encode(
        rng.integers(1, 2**62, ph.n, dtype=np.int64).tolist()))
        for i in range(M)}
    w_np = np.asarray(F.ints_to_limbs_fast(
        [FR.to_mont_host(int(rng.integers(1, 2**61))) for _ in range(M)]))
    members_flat = jnp.concatenate([polys[i] for i in range(M)])
    mono = ph.shplonk_fold(members_flat, jnp.asarray(w_np))
    chunked = ph.shplonk_fold_large(lambda i: polys[i], list(range(M)),
                                    w_np, B=2)  # forces full + remainder
    assert np.array_equal(np.asarray(mono), np.asarray(chunked))


def test_split_shplonk_l_matches_monolithic(setup):
    """shplonk_l_large (one transform per executable) must be
    value-identical to the fused L-witness graph."""
    import jax.numpy as jnp

    from halo2_aes_tpu.backend import prover as PRV
    from halo2_aes_tpu.ops import field as F

    _, _, pk = setup
    ph = PRV._get_phases(pk)
    FR = F.FR
    rng = np.random.default_rng(9)
    K = len(ph.shp_sets)

    def rnd(rows):
        return jnp.asarray(FR.encode(
            rng.integers(1, 2**62, rows, dtype=np.int64).tolist()))

    poly_flat, h_shp = rnd(K * ph.n), rnd(ph.n)
    svals = rnd(K)
    neg_zt_u, const_corr, u_m = (jnp.asarray(FR.encode(v))
                                 for v in (23, 29, 31))
    mono = ph.shplonk_l(poly_flat, svals, h_shp, neg_zt_u, const_corr,
                        u_m)
    split = ph.shplonk_l_large(poly_flat, svals, h_shp, neg_zt_u,
                               const_corr, u_m)
    assert np.array_equal(np.asarray(mono), np.asarray(split))
