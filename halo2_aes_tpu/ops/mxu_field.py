"""MXU int8-packed field multiplication — the named 100x move.

BASELINE.md's roofline shows the 16x16-bit-limb VPU Montgomery kernel
capped at ~1e8 mul/s/chip (~3% of the derived integer ceiling): TPU has
no native 32-bit integer multiply, so the carry-chained limb products
serialize on the VPU.  The MXU, by contrast, delivers ~394 TOPS of
int8 MACs on v5e — but only for matrix multiplies.  This module turns
the multiplications that dominate the prover (NTT twiddle application
and small-DFT stages, both *fixed-operand* multiplies) into int8
matmuls:

  * an Fr element is 64 nibbles (4-bit limbs) held in int8 lanes, so
    every partial product a_i * b_j <= 225 is exact in int8 x int8 ->
    int32 MXU accumulation;
  * multiplying a batch ``a[n]`` by a FIXED operand ``b`` is the limb
    convolution ``t_k = sum_{i+j=k} a_i b_j`` = ``a_nib @ banded(b)``
    — one [n,64] @ [64,127] int8 matmul;
  * an N-point DFT (the four-step NTT's inner stage) is
    ``X_j = sum_k w_jk x_k`` — ALL N^2 fixed-operand products fuse into
    a single [n, 64N] @ [64N, 127N] int8 matmul against the
    block-banded twiddle matrix, amortizing one Montgomery reduction
    per *output* instead of per product;
  * the reduction itself is full-word Montgomery with a widened
    R' = 2^272: m = (t mod R') * (-p^-1 mod R') mod R' and
    u = (t + m*p) / R' are two more matmuls against fixed banded
    matrices (N'-matrix, p-matrix).  R' = 2^272 > 2^18 * p * 2^... is
    chosen so even an N-term un-reduced sum t < N*p^2 reduces to < 2p
    in one pass for any N <= 2^17 (sum bound t < p*R').

Net: every mul against a fixed operand costs ~8k int8 MACs on the MXU
instead of ~1.1k serialized int32 VPU ops; at even 10% MXU utilization
that is >1e10 mul/s — the >=7.5x/chip the roofline calls for.  The
variable x variable muls (curve adds inside MSM) stay on the VPU
kernel; NTT butterflies and twiddle stages — the prover's largest mul
census — are the fixed-operand targets.

Role in the reference stack: this accelerates the backend the reference
imports as `halo2_proofs` (coset NTT in the vanishing argument —
SURVEY.md section 2.13 item 3); the reference's CPU analog is rayon
parallelism over 4x64-bit CIOS Montgomery muls.

Overflow audit (int32 accumulators): a product column receives at most
64 nibble products per operand pair, each <= 15*15 = 225, times N
operand pairs for the DFT matmul => <= 225*64*N; the nibble->16-bit
limb fold multiplies by at most (1+16+256+4096) = 4369.  N <= 32 keeps
every intermediate under 2^31 (N=16: 1.0e9).  Guarded by an assert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

NIB_BITS = 4
NIB_MASK = 0xF
NIBS = F.LIMBS * (F.LIMB_BITS // NIB_BITS)  # 64 nibbles per 256-bit element

# Widened full-word Montgomery radix: R' = 2^272 (17 16-bit limbs / 68
# nibbles).  Result bound: u = (t + m*p)/R' < t/R' + p, so t < p*R'
# (~2^526) guarantees u < 2p -> one conditional subtract.
RP_LIMBS = 17
RP_NIBS = RP_LIMBS * 4  # 68
RP_BITS = RP_LIMBS * F.LIMB_BITS  # 272

_I8 = jnp.int8
_I32 = jnp.int32
_U32 = jnp.uint32

# Max N for the DFT block matmul before int32 accumulators can overflow
# (see overflow audit in the module docstring).
DFT_MAX_N = 32


# --------------------------------------------------------------------------
# host-side matrix builders (numpy, cached per (field, operand))
# --------------------------------------------------------------------------

def _int_to_nibbles(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (NIB_BITS * i)) & NIB_MASK for i in range(n)],
                    dtype=np.int8)


def banded(value: int, in_nibs: int, out_nibs: int) -> np.ndarray:
    """int8[in_nibs, out_nibs] with B[i, k] = nibble_{k-i}(value).

    ``a_nib @ B`` is then the nibble convolution of a (in_nibs wide)
    with ``value`` — the un-carried product in nibble weights.
    """
    nib = _int_to_nibbles(value, out_nibs)  # generous; zero beyond value
    B = np.zeros((in_nibs, out_nibs), dtype=np.int8)
    for i in range(in_nibs):
        w = out_nibs - i
        B[i, i:] = nib[:w]
    return B


@functools.lru_cache(maxsize=8)
def _reducer_mats(modulus: int):
    """Fixed matrices for the R' = 2^272 full-word Montgomery reduction."""
    rp = 1 << RP_BITS
    np_inv = (-pow(modulus, -1, rp)) % rp  # N' = -p^-1 mod R'
    # m = (t mod R') * N' mod R': [.., 68] @ [68, 68] (columns >= 68 dropped
    # by truncating the band — they only affect bits >= 272).
    NP = banded(np_inv, RP_NIBS, RP_NIBS)
    # m * p: m is 68 nibbles, p is 64 -> 131 product columns.
    P = banded(modulus, RP_NIBS, RP_NIBS + NIBS - 1)
    return NP, P


# --------------------------------------------------------------------------
# device-side primitives
# --------------------------------------------------------------------------

def nibbles_from_limbs(a) -> jnp.ndarray:
    """u32[..., L] 16-bit limbs -> int8[..., 4L] nibbles (values 0..15)."""
    shifts = jnp.array([0, 4, 8, 12], dtype=_U32)
    nib = (a[..., None] >> shifts) & _U32(NIB_MASK)
    return nib.reshape(*a.shape[:-1], a.shape[-1] * 4).astype(_I8)


def _fold_to_limbs(conv, out_limbs: int) -> jnp.ndarray:
    """int32[..., C] nibble-weighted columns -> u32[..., out_limbs]
    redundant 16-bit-limb accumulator (limb_j = sum_r conv[4j+r] << 4r)."""
    c = conv.shape[-1]
    pad = out_limbs * 4 - c
    assert pad >= 0, (c, out_limbs)
    if pad:
        conv = jnp.pad(conv, [(0, 0)] * (conv.ndim - 1) + [(0, pad)])
    g = conv.reshape(*conv.shape[:-1], out_limbs, 4).astype(_U32)
    w = jnp.array([1, 16, 256, 4096], dtype=_U32)
    return jnp.sum(g * w, axis=-1)


def carry_norm_ks(acc, out_limbs: int) -> jnp.ndarray:
    """Log-depth carry normalization (Kogge-Stone), replacing the
    sequential per-limb chain for the MXU path's 17-34-limb values.

    ``acc``: u32[..., m] redundant 16-bit limbs, each < 2^31.  Two
    split-add passes leave every limb <= 0x10000 (residue + at most one
    carry bit); the remaining ripple is a generate/propagate prefix
    scan (g = limb > 0xFFFF, p = limb == 0xFFFF), associative, done in
    ceil(log2 m) steps by jax.lax.associative_scan.
    """
    m = acc.shape[-1]
    v = acc
    for _ in range(2):
        c = v >> F.LIMB_BITS
        v = (v & _mask_u32()) + jnp.concatenate(
            [jnp.zeros((*c.shape[:-1], 1), _U32), c[..., :-1]], axis=-1)
    g = (v > _mask_u32()).astype(_U32)
    p = (v == _mask_u32()).astype(_U32)

    def combine(a_, b_):
        ga, pa = a_
        gb, pb = b_
        return gb | (pb & ga), pb & pa

    gs, _ = jax.lax.associative_scan(combine, (g, p), axis=-1)
    cin = jnp.concatenate(
        [jnp.zeros((*gs.shape[:-1], 1), _U32), gs[..., :-1]], axis=-1)
    out = (v + cin) & _mask_u32()
    return out[..., :out_limbs]


def _mask_u32():
    return _U32(0xFFFF)


def _dot_i8(a, B) -> jnp.ndarray:
    """nibble [..., K] @ nibble [K, M] -> int32 [..., M] on the MXU.

    Runs in bf16 with f32 accumulation: every operand is a nibble
    (0..15, exact in bf16) and every accumulator column is bounded by
    225 * 64 * DFT_MAX_N = 460,800 < 2^24, so the f32 sums are exact
    integers.  Measured on v5e: the bf16 MXU path is ~3.2x the XLA
    int8-dot lowering at these shapes.
    """
    r = jax.lax.dot_general(
        a.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return r.astype(_I32)


def reduce_wide(spec: F.FieldSpec, t_norm) -> jnp.ndarray:
    """Full-word Montgomery reduction by R' = 2^272 via two int8 matmuls.

    ``t_norm``: u32[..., T] canonical 16-bit limbs, value < p * 2^272.
    Returns u32[..., 16] canonical limbs of t * 2^-272 mod p.
    """
    NP, P = _reducer_mats(spec.modulus)
    t_lo = t_norm[..., :RP_LIMBS]
    # m = (t mod R') * N' mod R'
    m_conv = _dot_i8(nibbles_from_limbs(t_lo), jnp.asarray(NP))
    m_norm = carry_norm_ks(_fold_to_limbs(m_conv, RP_LIMBS),
                           out_limbs=RP_LIMBS)  # drops carry -> mod R'
    # u = (t + m*p) / R'
    mp_conv = _dot_i8(nibbles_from_limbs(m_norm), jnp.asarray(P))
    mp_l = _fold_to_limbs(mp_conv, RP_LIMBS + F.LIMBS)  # 33 limbs
    T = max(t_norm.shape[-1], RP_LIMBS + F.LIMBS) + 1
    u = (jnp.pad(t_norm, [(0, 0)] * (t_norm.ndim - 1)
                 + [(0, T - t_norm.shape[-1])])
         + jnp.pad(mp_l, [(0, 0)] * (mp_l.ndim - 1)
                   + [(0, T - mp_l.shape[-1])]))
    u_norm = carry_norm_ks(u, out_limbs=T)
    r = u_norm[..., RP_LIMBS:RP_LIMBS + F.LIMBS]  # exact /R' (low limbs 0)
    return F._cond_sub_p(spec, r)


# --------------------------------------------------------------------------
# public ops
# --------------------------------------------------------------------------

class FixedMul:
    """Montgomery multiply of a batch by ONE fixed operand, on the MXU.

    ``FixedMul(spec, b_limb_value)(a) == mont_mul(spec, a, b)`` for the
    same 16-limb value of b (i.e. matching mont semantics a*b*2^-256:
    the banded matrix bakes in the 2^16 bridge between R = 2^256 and
    R' = 2^272).
    """

    def __init__(self, spec: F.FieldSpec, b_value: int):
        self.spec = spec
        b_scaled = (b_value << (RP_BITS - F.NBITS)) % spec.modulus
        self._B = jnp.asarray(banded(b_scaled, NIBS, 2 * NIBS - 1))

    def __call__(self, a) -> jnp.ndarray:
        conv = _dot_i8(nibbles_from_limbs(a), self._B)
        t = carry_norm_ks(_fold_to_limbs(conv, 2 * F.LIMBS),
                          out_limbs=2 * F.LIMBS)
        return reduce_wide(self.spec, t)


class DftMatmul:
    """N-point DFT over Fr as ONE int8 matmul + one reduction per output.

    ``w`` is the N x N plain-int matrix (w[j][k] multiplies input k into
    output j — e.g. omega^(j*k) for a forward DFT).  Inputs/outputs are
    u32[..., N, 16] limb arrays in a consistent form (Montgomery in ->
    Montgomery out).  This is the MXU form of the four-step NTT's inner
    stage: all N^2 twiddle products of a column land in one matmul.
    """

    def __init__(self, spec: F.FieldSpec, w: "list[list[int]]"):
        n = len(w)
        assert n <= DFT_MAX_N, f"int32 accumulator bound: N <= {DFT_MAX_N}"
        self.spec = spec
        self.n = n
        # v = w * 2^272 mod p: the R' division then cancels exactly, so
        # outputs stay in whatever form the inputs were (Montgomery in ->
        # Montgomery out for plain-int w entries).
        shift = RP_BITS
        big = np.zeros((n * NIBS, n * (2 * NIBS - 1)), dtype=np.int8)
        for j in range(n):
            for k in range(n):
                v = (int(w[j][k]) << shift) % spec.modulus
                big[k * NIBS:(k + 1) * NIBS,
                    j * (2 * NIBS - 1):(j + 1) * (2 * NIBS - 1)] = \
                    banded(v, NIBS, 2 * NIBS - 1)
        self._W = jnp.asarray(big)

    def __call__(self, x) -> jnp.ndarray:
        n = self.n
        assert x.shape[-2] == n
        xn = nibbles_from_limbs(x)  # (..., n, 64)
        flat = xn.reshape(*xn.shape[:-2], n * NIBS)
        conv = _dot_i8(flat, self._W)  # (..., n*(127))
        conv = conv.reshape(*conv.shape[:-1], n, 2 * NIBS - 1)
        # t = sum_k x_k * w'_jk < N * p^2 can exceed 2^512 for N > 16:
        # carry-normalize into 33 limbs so no high bit is dropped.
        t = carry_norm_ks(_fold_to_limbs(conv, 2 * F.LIMBS + 1),
                          out_limbs=2 * F.LIMBS + 1)
        return reduce_wide(self.spec, t)


class BatchedDftMatmul:
    """G independent N-point linear maps, one batched int8 matmul.

    ``ws[g][j][k]`` multiplies input k into output j within group g.
    Input/output shape (..., G, N, 16).  This is the second four-step
    stage with its inter-stage twiddles FOLDED INTO the per-group
    matrices — see ``ntt256``.
    """

    def __init__(self, spec: F.FieldSpec, ws):
        g, n = len(ws), len(ws[0])
        assert n <= DFT_MAX_N
        self.spec, self.g, self.n = spec, g, n
        big = np.zeros((g, n * NIBS, n * (2 * NIBS - 1)), dtype=np.int8)
        for gi in range(g):
            for j in range(n):
                for k in range(n):
                    v = (int(ws[gi][j][k]) << RP_BITS) % spec.modulus
                    big[gi, k * NIBS:(k + 1) * NIBS,
                        j * (2 * NIBS - 1):(j + 1) * (2 * NIBS - 1)] = \
                        banded(v, NIBS, 2 * NIBS - 1)
        self._W = jnp.asarray(big)

    def __call__(self, x) -> jnp.ndarray:
        g, n = self.g, self.n
        assert x.shape[-3] == g and x.shape[-2] == n
        lead = x.shape[:-3]
        xn = nibbles_from_limbs(x).reshape(-1, g, n * NIBS)
        # batch dim g on both operands; contract the nibble axis
        conv = jax.lax.dot_general(
            xn, self._W, (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=_I32)  # (g, batch, n*127)
        conv = jnp.moveaxis(conv, 0, 1).reshape(
            *lead, g, n, 2 * NIBS - 1)
        t = carry_norm_ks(_fold_to_limbs(conv, 2 * F.LIMBS + 1),
                          out_limbs=2 * F.LIMBS + 1)
        return reduce_wide(self.spec, t)


@functools.lru_cache(maxsize=4)
def _ntt256_stages(spec: F.FieldSpec):
    p = spec.modulus
    omega = pow(spec.generator, (p - 1) // 256, p)  # 256th root
    w16 = pow(omega, 16, p)
    stage1 = [[pow(w16, j * k, p) for k in range(16)] for j in range(16)]
    # group = k1 (first-stage output index); out[k2] = sum_{n2}
    # omega^{n2*k1} * w16^{n2*k2} * in[n2]
    stage2 = [[[(pow(omega, n2 * k1, p) * pow(w16, n2 * k2, p)) % p
                for n2 in range(16)] for k2 in range(16)]
              for k1 in range(16)]
    return DftMatmul(spec, stage1), BatchedDftMatmul(spec, stage2)


def ntt256(spec: F.FieldSpec, x) -> jnp.ndarray:
    """256-point NTT on the MXU: two batched int8 matmuls, no butterflies.

    ``x``: u32[..., 256, 16] (Montgomery form).  Four-step with n =
    16*n1 + n2, k = k1 + 16*k2; the inter-stage twiddle omega^(n2*k1)
    is folded into the 16 second-stage matrices, so the whole transform
    is exactly two MXU matmuls + two Montgomery reductions.  This is
    the inner-stage building block for MXU-resident large NTTs (the
    coset NTT dominating the quotient phase — BASELINE.md k=17 profile).
    """
    d1, d2 = _ntt256_stages(spec)
    lead = x.shape[:-2]
    v = x.reshape(*lead, 16, 16, F.LIMBS)        # (n1, n2)
    a = d1(jnp.swapaxes(v, -3, -2))              # (n2, k1): DFT over n1
    b = d2(jnp.swapaxes(a, -3, -2))              # (k1, k2): twiddled DFT
    return jnp.swapaxes(b, -3, -2).reshape(*lead, 256, F.LIMBS)
