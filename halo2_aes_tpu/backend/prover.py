"""The full KZG/SHPLONK prover.

Role of halo2's create_proof with KZGCommitmentScheme + ProverSHPLONK
(reference src/main.rs:94-101; SURVEY.md section 2.13 item 3), built
TPU-first: witness columns arrive as one batched tensor, every
polynomial move is an NTT, every grand product an associative scan,
every commitment a device MSM; the host only orchestrates transcript
squeezes and scalar bookkeeping.

Transcript order (self-consistent with verifier.py):
  vk digest, instance values | advice commits | theta | per lookup:
  A'/S' commits | beta, gamma | permutation z commits | lookup z
  commits | random-poly commit | y | h piece commits | x | evals in
  protocol.open_queries order (h skipped) | v | SHPLONK h commit | u |
  SHPLONK witness commit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from halo2_aes_tpu.backend import lookup as LK
from halo2_aes_tpu.backend import permutation as PERM
from halo2_aes_tpu.backend import poly as P
from halo2_aes_tpu.backend import protocol as PROTO
from halo2_aes_tpu.backend.keygen import ProvingKey
from halo2_aes_tpu.backend.transcript import TranscriptWriter
from halo2_aes_tpu.circuit.ir import ADVICE, INSTANCE
from halo2_aes_tpu.ops import curve as CV
from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops.ntt import domain

FR = F.FR


class DeviceAlgebra:
    """Field algebra over (m, LIMBS) Montgomery arrays."""

    @staticmethod
    def const(v: int):
        return jnp.asarray(FR.encode(v))

    add = staticmethod(lambda a, b: F.add(FR, a, b))
    mul = staticmethod(lambda a, b: F.mont_mul(FR, a, b))
    neg = staticmethod(lambda a: F.neg(FR, a))


def _rand_field(rng, *shape):
    """Uniform-ish random field elements as (..., 16) limb arrays."""
    limbs = rng.integers(0, 1 << 16, size=(*shape, F.LIMBS), dtype=np.uint32)
    limbs[..., -1] &= 0x1FFF  # < 2^253 < r
    return jnp.asarray(limbs)


class _ProverContext(PROTO.Context):
    """protocol.Context over extended-coset evaluation tensors."""

    alg = DeviceAlgebra

    def __init__(self, pk, ext, ratio):
        self.pk = pk
        self.ext = ext          # dict: key -> (ext_n, LIMBS)
        self.ratio = ratio
        self.usable = pk.vk.usable
        self.one = jnp.asarray(FR.one_mont)

    def _rot(self, arr, rot):
        if rot == "u":
            rot = self.usable
        return P.rotate_ext(arr, rot, self.ratio)

    def column(self, col, rot):
        return self._rot(self.ext[("col", col)], rot)

    def perm_z(self, t, rot):
        return self._rot(self.ext[("perm_z", t)], rot)

    def sigma(self, i):
        return self.ext[("sigma", i)]

    def perm_id(self, i):
        return self.ext[("id", i)]

    def lookup_z(self, i, rot):
        return self._rot(self.ext[("lookup_z", i)], rot)

    def lookup_a(self, i, rot):
        return self._rot(self.ext[("lookup_a", i)], rot)

    def lookup_s(self, i):
        return self.ext[("lookup_s", i)]


def _commit_write(tr, pk, coeffs):
    pt = CV.to_affine_host(pk.srs.commit(coeffs))[0]
    tr.write_point(pt)
    return pt


def _pack_u32(cols):
    key = jnp.zeros_like(cols[0], dtype=jnp.uint32)
    for c in cols:
        key = (key << 8) | c.astype(jnp.uint32)
    return key


def prove(pk: ProvingKey, values_u32, instances=None, seed=None) -> bytes:
    """values_u32: (num_columns, n) uint32 merged column matrix (from
    circuit.witness.assemble_values) — advice entries are read from it,
    fixed entries are taken from the pk.  instances: list (per instance
    column) of python-int lists.  Returns proof bytes."""
    vk = pk.vk
    cs = vk.cs
    layout = pk.layout
    k, n, usable = vk.k, layout.n, vk.usable
    dom = domain(FR, k)
    dom_ext = domain(FR, vk.ext_k)
    ratio = dom_ext.n // n
    bf = n - usable - 1
    rng = np.random.default_rng(seed)
    tr = TranscriptWriter()

    tr.common_scalar(vk.digest)
    inst_ids = layout.instance_ids()
    if instances is None:
        # default: read instance values out of the assembled matrix (rows
        # the layout mapped, e.g. exposed ciphertext bytes)
        instances = []
        for c in inst_ids:
            mapped = np.nonzero(layout.witness_map[c] >= 0)[0]
            ln = int(mapped.max()) + 1 if len(mapped) else 0
            instances.append([int(v) for v in np.asarray(values_u32[c][:ln])])
    assert len(instances) == len(inst_ids)
    for vals in instances:
        for v in vals:
            tr.common_scalar(int(v))

    # ---- advice columns: lift, blind, commit --------------------------------
    col_field = dict(pk.fixed_field)
    advice_coeffs = {}
    values_u32 = jnp.asarray(values_u32)
    for c in layout.advice_ids():
        fld = F.u16_to_field(FR, values_u32[c])
        fld = jnp.concatenate([fld[:usable], _rand_field(rng, n - usable)])
        col_field[c] = fld
        advice_coeffs[c] = P.to_coeffs(dom, fld)
    for c, vals in zip(inst_ids, instances):
        arr = np.zeros(n, dtype=np.uint32)
        arr[: len(vals)] = [int(v) % (1 << 16) for v in vals]
        assert all(0 <= int(v) < (1 << 16) for v in vals)
        col_field[c] = F.u16_to_field(FR, jnp.asarray(arr))
    commitments = {}
    for c in layout.advice_ids():
        commitments[("advice", c)] = _commit_write(tr, pk, advice_coeffs[c])

    theta = tr.squeeze_challenge()
    theta_m = DeviceAlgebra.const(theta)

    # ---- lookups: permuted pairs --------------------------------------------
    class _BaseCtx(PROTO.Context):
        alg = DeviceAlgebra
        theta = theta_m

        @staticmethod
        def column(col, rot):
            v = col_field[col]
            return jnp.roll(v, -rot, axis=0) if rot else v

    lookup_data = []
    for lk in cs.lookups:
        a_fld = PROTO.compressed_input(_BaseCtx, lk)
        s_fld = PROTO.compressed_table(_BaseCtx, lk)
        packed_a = _pack_u32([e.eval(_Int32Alg, _int32_getter(values_u32)) for e, _ in lk.pairs])
        packed_s = _pack_u32([values_u32[c] for _, c in lk.pairs])
        a_ord, s_ord = LK.permuted_indices(packed_a, packed_s, usable)
        a_prime = LK.apply_permutation(a_fld[:usable], a_ord, _rand_field(rng, n - usable))
        s_prime = LK.apply_permutation(s_fld[:usable], s_ord, _rand_field(rng, n - usable))
        lookup_data.append({
            "a": a_fld, "s": s_fld, "a_prime": a_prime, "s_prime": s_prime,
            "a_coeffs": P.to_coeffs(dom, a_prime),
            "s_coeffs": P.to_coeffs(dom, s_prime),
        })
    for i, ld in enumerate(lookup_data):
        commitments[("lookup_a", i)] = _commit_write(tr, pk, ld["a_coeffs"])
        commitments[("lookup_s", i)] = _commit_write(tr, pk, ld["s_coeffs"])

    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()
    beta_m = jnp.asarray(FR.encode(beta))
    gamma_m = jnp.asarray(FR.encode(gamma))

    # ---- permutation grand products ----------------------------------------
    chunk_len = cs.permutation_chunk_len()
    chunks = -(-len(cs.perm_columns) // chunk_len)
    perm_values = jnp.stack([col_field[c] for c in cs.perm_columns])
    z_perm = PERM.grand_products(
        k, usable, chunk_len, perm_values, pk.sigma_values, pk.id_values,
        beta_m, gamma_m, _rand_field(rng, chunks, bf),
    )
    z_perm_coeffs = [P.to_coeffs(dom, z_perm[t]) for t in range(chunks)]
    for t in range(chunks):
        commitments[("perm_z", t)] = _commit_write(tr, pk, z_perm_coeffs[t])

    # ---- lookup grand products ----------------------------------------------
    for i, ld in enumerate(lookup_data):
        z = LK.grand_product(ld["a"], ld["s"], ld["a_prime"], ld["s_prime"],
                             usable, beta_m, gamma_m, _rand_field(rng, bf))
        ld["z"] = z
        ld["z_coeffs"] = P.to_coeffs(dom, z)
        commitments[("lookup_z", i)] = _commit_write(tr, pk, ld["z_coeffs"])

    # ---- vanishing random poly ----------------------------------------------
    random_coeffs = _rand_field(rng, n)
    commitments[("random",)] = _commit_write(tr, pk, random_coeffs)

    y = tr.squeeze_challenge()
    y_m = jnp.asarray(FR.encode(y))

    # ---- quotient on the extended coset domain ------------------------------
    ext = {}
    needed_cols = set()
    for _, g in cs.gates:
        needed_cols |= {c for c, _ in g.columns()}
    for lk in cs.lookups:
        for e, tc in lk.pairs:
            needed_cols |= {c for c, _ in e.columns()}
            needed_cols.add(tc)
    needed_cols |= set(cs.perm_columns)
    for c in needed_cols:
        src = advice_coeffs.get(c)
        if src is None:
            src = pk.fixed_coeffs.get(c)
        if src is None:
            src = P.to_coeffs(dom, col_field[c])  # instance
        ext[("col", c)] = P.coset_evals(dom_ext, src)
    for i in range(len(cs.perm_columns)):
        ext[("sigma", i)] = P.coset_evals(dom_ext, pk.sigma_coeffs[i])
        # id_i(X) = delta^i * X on the coset
        pts = _coset_points(dom_ext)
        d_i = jnp.asarray(FR.encode(pow(PERM.delta(), i, FR.modulus)))
        ext[("id", i)] = F.mont_mul(FR, pts, d_i)
    for t in range(chunks):
        ext[("perm_z", t)] = P.coset_evals(dom_ext, z_perm_coeffs[t])
    for i, ld in enumerate(lookup_data):
        ext[("lookup_z", i)] = P.coset_evals(dom_ext, ld["z_coeffs"])
        ext[("lookup_a", i)] = P.coset_evals(dom_ext, ld["a_coeffs"])
        ext[("lookup_s", i)] = P.coset_evals(dom_ext, ld["s_coeffs"])

    ctx = _ProverContext(pk, ext, ratio)
    ctx.theta = DeviceAlgebra.const(theta)
    ctx.beta = jnp.asarray(FR.encode(beta))
    ctx.gamma = jnp.asarray(FR.encode(gamma))
    ctx.l0 = P.coset_evals(dom_ext, pk.l0_coeffs)
    ctx.l_last = P.coset_evals(dom_ext, pk.l_last_coeffs)
    ctx.l_active = P.coset_evals(dom_ext, pk.l_active_coeffs)

    acc = None
    for term in PROTO.constraint_terms(cs, ctx):
        acc = term if acc is None else F.add(FR, F.mont_mul(FR, acc, y_m), term)
    q_ext = P.divide_by_vanishing(k, dom_ext, acc)
    h_coeffs = P.coset_interp(dom_ext, q_ext)
    pieces = [h_coeffs[j * n : (j + 1) * n] for j in range(ratio)]
    for j, piece in enumerate(pieces):
        commitments[("h_piece", j)] = _commit_write(tr, pk, piece)

    x = tr.squeeze_challenge()
    xn = pow(x, n, FR.modulus)
    h_combined = pieces[0]
    sc = 1
    for piece in pieces[1:]:
        sc = sc * xn % FR.modulus
        h_combined = F.add(FR, h_combined,
                           F.mont_mul(FR, piece, jnp.asarray(FR.encode(sc))))

    # ---- evaluations ----------------------------------------------------------
    def poly_coeffs(key):
        kind = key[0]
        if kind == "advice":
            return advice_coeffs[key[1]]
        if kind == "fixed":
            return pk.fixed_coeffs[key[1]]
        if kind == "sigma":
            return pk.sigma_coeffs[key[1]]
        if kind == "perm_z":
            return z_perm_coeffs[key[1]]
        if kind == "lookup_z":
            return lookup_data[key[1]]["z_coeffs"]
        if kind == "lookup_a":
            return lookup_data[key[1]]["a_coeffs"]
        if kind == "lookup_s":
            return lookup_data[key[1]]["s_coeffs"]
        if kind == "h":
            return h_combined
        if kind == "random":
            return random_coeffs
        raise KeyError(key)

    omega = dom.omega

    def rot_point(rot):
        r = usable if rot == "u" else rot
        return x * pow(omega, r % dom.n, FR.modulus) % FR.modulus

    plan = PROTO.open_queries(cs)
    # batch evals per distinct rotation
    by_rot = {}
    for key, rot in plan:
        by_rot.setdefault(rot, []).append(key)
    evals = {}
    for rot, keys in by_rot.items():
        stacked = jnp.stack([poly_coeffs(kk) for kk in keys])
        vals = P.eval_at(stacked, rot_point(rot))
        for kk, v in zip(keys, vals):
            evals[(kk, rot)] = v
    for key, rot in plan:
        if key[0] != "h":
            tr.write_scalar(evals[(key, rot)])

    # ---- SHPLONK multiopen ----------------------------------------------------
    v = tr.squeeze_challenge()
    groups = PROTO.group_queries(plan)
    t_rots = []
    for _, rots in groups:
        for r in rots:
            if r not in t_rots:
                t_rots.append(r)
    t_points = [rot_point(r) for r in t_rots]

    # f(X) = sum_i v^i Z_{T\S_i}(X) (p_i(X) - r_i(X))
    f_acc = jnp.zeros((n + len(t_points) - 1, F.LIMBS), jnp.uint32)
    v_pow = 1
    r_at = {}
    for gi, (key, rots) in enumerate(groups):
        pts = [rot_point(r) for r in rots]
        evs = [evals[(key, r)] for r in rots]
        r_coeffs = P.lagrange_interp_host(pts, evs)
        p_m_r = poly_coeffs(key)
        corr = jnp.asarray(F.ints_to_limbs_fast(
            [FR.to_mont_host(c) for c in r_coeffs]))
        p_m_r = p_m_r.at[: len(r_coeffs)].set(
            F.sub(FR, p_m_r[: len(r_coeffs)], corr))
        z_rest = P.vanishing_poly_coeffs([p for p in t_points if p not in pts])
        for d, zc in enumerate(z_rest):
            s = v_pow * zc % FR.modulus
            if s:
                f_acc = f_acc.at[d : d + n].set(F.add(
                    FR, f_acc[d : d + n],
                    F.mont_mul(FR, p_m_r, jnp.asarray(FR.encode(s)))))
        r_at[key] = (pts, evs)
        v_pow = v_pow * v % FR.modulus

    dom1 = domain(FR, k + 1)
    f_ev = P.coset_evals(dom1, P.pad_coeffs(f_acc, dom1.n))
    zt_ev = _eval_on_coset(dom1, P.vanishing_poly_coeffs(t_points))
    h_shp = P.coset_interp(dom1, F.mont_mul(FR, f_ev, F.batch_inv(FR, zt_ev)))[:n]
    _commit_write(tr, pk, h_shp)

    u = tr.squeeze_challenge()
    zt_u = P.eval_host(P.vanishing_poly_coeffs(t_points), u)
    l_acc = F.mont_mul(FR, h_shp, jnp.asarray(FR.encode(FR.modulus - zt_u)))
    const_corr = 0
    v_pow = 1
    for gi, (key, rots) in enumerate(groups):
        pts, evs = r_at[key]
        s = v_pow * P.eval_host(
            P.vanishing_poly_coeffs([p for p in t_points if p not in pts]), u
        ) % FR.modulus
        l_acc = F.add(FR, l_acc,
                      F.mont_mul(FR, poly_coeffs(key), jnp.asarray(FR.encode(s))))
        r_u = P.eval_host(P.lagrange_interp_host(pts, evs), u)
        const_corr = (const_corr + s * r_u) % FR.modulus
        v_pow = v_pow * v % FR.modulus
    l_acc = l_acc.at[0].set(F.sub(FR, l_acc[0], jnp.asarray(FR.encode(const_corr))))

    l_ev = P.coset_evals(dom, l_acc)
    den = F.sub(FR, _coset_points(dom), jnp.asarray(FR.encode(u)))
    q_w = P.coset_interp(dom, F.mont_mul(FR, l_ev, F.batch_inv(FR, den)))
    _commit_write(tr, pk, q_w)

    return tr.finalize()


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=None)
def _coset_points(dom_ext):
    """(n, 16) Montgomery values of the coset points g * w^j."""
    pts = FR.host_powers(dom_ext.omega, dom_ext.n)
    g = jnp.asarray(FR.encode(P.GEN))
    return F.mont_mul(FR, jnp.asarray(pts), g)


def _eval_on_coset(dom, coeffs_plain):
    """Evaluate a short plain-int poly on every coset point (Horner)."""
    pts = _coset_points(dom)
    acc = jnp.broadcast_to(jnp.asarray(FR.encode(coeffs_plain[-1])),
                           (dom.n, F.LIMBS))
    for c in reversed(coeffs_plain[:-1]):
        acc = F.add(FR, F.mont_mul(FR, acc, pts),
                    jnp.broadcast_to(jnp.asarray(FR.encode(c)), (dom.n, F.LIMBS)))
    return acc


class _Int32Alg:
    @staticmethod
    def const(v):
        return jnp.int32(v)

    add = staticmethod(lambda a, b: a + b)
    mul = staticmethod(lambda a, b: a * b)
    neg = staticmethod(lambda a: -a)


def _int32_getter(values_u32):
    def get(col, rot):
        v = values_u32[col].astype(jnp.int32)
        return jnp.roll(v, -rot) if rot else v

    return get
