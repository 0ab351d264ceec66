"""Fused four-step NTT in Pallas: all butterfly stages in VMEM.

Role of the reference backend's best_fft (SURVEY.md section 2.13 item 3)
at TPU speed-of-light.  The XLA NTT in ops/ntt.py pays three HBM
gathers per stage (~60 ms per 2^17 transform); here a size-n transform
is decomposed Bailey-style as n = n1 * n2 and each pass runs ALL of its
log2(T) radix-2 stages inside one Pallas kernel with the data resident
in VMEM:

  x[i1*n2 + i2] --(transpose)--> rows over i2, lanes over i1
    pass 1: DIF NTT of length n1 along lanes   (output bit-reversed)
    elementwise twiddle  w^(i2*k1)             (one Montgomery multiply)
    (transpose)
    pass 2: DIF NTT of length n2 along lanes   (output bit-reversed)
  one static gather fixes both bit-reversals:  X[k2*n1 + k1]

The kernel keeps the classic TPU tricks: limb-major (16, R, T) blocks
(lane dim = transform, full 128-lane tiles), butterflies via lane ROLLS
instead of gathers (partner fetch is a register shuffle), and per-stage
twiddle tables with Montgomery ONE in the passive lanes so each stage
is exactly one full-width CIOS multiply.  Everything is unrolled
straight-line vector code — one Mosaic compile per (T, R) shape for the
process lifetime (see memory/tpu-pallas-compile-rules).

Inverse transforms fold n^-1 into the mid twiddle table, so an INTT
costs exactly a forward NTT.

Enabled on TPU via ``set_enabled`` (pallas_field.enable_in_field_ops
turns it on); CPU tests run the same kernels with interpret=True.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_aes_tpu.ops import field as F

LIMBS = F.LIMBS
MASK = 0xFFFF

_ENABLED = False
_INTERPRET = False  # CPU tests flip this to run kernels in interpret mode

# One Pallas invocation processes (LIMBS, R, T); R*T lanes*sublanes per
# grid step.  2^14 elements keeps the ~8 live plane-sets of the
# unrolled butterfly+CIOS lattice (in, rolled pair, add, sub, select,
# twiddle product partials) under the 16 MB scoped-VMEM limit — 2^15
# measured 16.2 MB on v5e and failed Mosaic compile.
_BLOCK_ELEMS = 1 << 14
_MIN_K = 15          # below this the XLA path is fine (tiny transforms)
_MAX_LANES = 2048    # largest single-pass transform length


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(on)


def enabled_for(dom) -> bool:
    if not (_ENABLED or _INTERPRET):
        return False
    if dom.k < _MIN_K or dom.k > 2 * (_MAX_LANES.bit_length() - 1):
        return False
    return dom.spec.two_adicity > 0


# ---------------------------------------------------------------------------
# host-side tables (numpy, cached; python-bigint powers like ntt.Domain)
# ---------------------------------------------------------------------------


def _bitrev(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _root(spec: F.FieldSpec, k: int, inverse: bool) -> int:
    w = pow(spec.root_of_unity(), 1 << (spec.two_adicity - k), spec.modulus)
    return pow(w, -1, spec.modulus) if inverse else w


@functools.lru_cache(maxsize=None)
def _stage_tables(spec: F.FieldSpec, lt: int, inverse: bool) -> np.ndarray:
    """(lt*LIMBS, T) Montgomery twiddles: stage s at rows [s*16,(s+1)*16);
    lane i holds 1 in the lower butterfly half, w^(j*2^s) in the upper."""
    T = 1 << lt
    w = _root(spec, lt, inverse)
    p = spec.modulus
    rows = []
    for s in range(lt):
        h = T >> (s + 1)
        step = pow(w, 1 << s, p)
        vals = [1] * T
        acc = 1
        for j in range(h):
            for blk in range(T // (2 * h)):
                vals[blk * 2 * h + h + j] = acc
            acc = (acc * step) % p
        rows.append(spec.encode(vals))                     # (T, 16)
    arr = np.stack(rows)                                    # (lt, T, 16)
    return np.ascontiguousarray(arr.transpose(0, 2, 1).reshape(lt * LIMBS, T))


@functools.lru_cache(maxsize=None)
def _mid_table(spec: F.FieldSpec, k: int, k1: int, inverse: bool) -> np.ndarray:
    """(LIMBS, n) Montgomery table w^(i2*k1) laid out to match pass-1
    output ((i2 row, bit-reversed k1 lane) flattened); inverse folds in
    n^-1 so the INTT needs no separate scale."""
    p = spec.modulus
    n, n1 = 1 << k, 1 << k1
    n2 = n >> k1
    w = _root(spec, k, inverse)
    rev1 = _bitrev(k1)
    scale = pow(n, -1, p) if inverse else 1
    out = np.empty(n, dtype=object)
    for i2 in range(n2):
        base = pow(w, i2, p)
        acc = scale
        row = np.empty(n1, dtype=object)
        for j in range(n1):
            row[j] = acc
            acc = (acc * base) % p
        out[i2 * n1 : (i2 + 1) * n1] = row[rev1]
    limbs = spec.encode([int(v) for v in out])              # (n, 16)
    return np.ascontiguousarray(limbs.T)                    # (16, n)


@functools.lru_cache(maxsize=None)
def _out_perm(k: int, k1: int) -> np.ndarray:
    """(n,) int32: natural-order output k2*n1+k1 gathered from the
    (bit-reversed k1 row, bit-reversed k2 lane) layout after pass 2."""
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    pos1 = np.argsort(_bitrev(k1)).astype(np.int64)
    pos2 = np.argsort(_bitrev(k2)).astype(np.int64)
    return (pos1[None, :] * n2 + pos2[:, None]).reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _out_perm_batch(k: int, k1: int, count: int) -> np.ndarray:
    n = 1 << k
    perm = _out_perm(k, k1).astype(np.int64)
    full = (np.arange(count)[:, None] * n + perm[None, :]).reshape(-1)
    return full.astype(np.int32)


# ---------------------------------------------------------------------------
# the kernel: log2(T) DIF stages on a (LIMBS, R, T) VMEM block
# ---------------------------------------------------------------------------


def _roll(x, shift: int):
    if _INTERPRET:
        return jnp.roll(x, shift, axis=1)
    # pltpu.roll requires a non-negative shift; cyclic roll by -h on an
    # axis of length T is the same as roll by T - h
    return pltpu.roll(x, shift % x.shape[1], 1)


def _carry_chain(vals):
    """Propagate 16-bit carries through a list of u32 planes."""
    out = []
    carry = None
    for v in vals:
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> 16
    return out


def _cond_sub_p(limbs, p):
    borrow = None
    diff = []
    for i in range(LIMBS):
        v = limbs[i] + (1 << 16) - p[i]
        if borrow is not None:
            v = v - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> 16)
    ge = borrow == 0
    return [jnp.where(ge, d, l) for d, l in zip(diff, limbs)]


def _add_mod(a, b, p):
    s = _carry_chain([x + y for x, y in zip(a, b)])
    return _cond_sub_p(s, p)


def _sub_mod(a, b, p):
    borrow = None
    d = []
    for i in range(LIMBS):
        v = a[i] + (1 << 16) - b[i]
        if borrow is not None:
            v = v - borrow
        d.append(v & MASK)
        borrow = 1 - (v >> 16)
    neg = borrow == 1
    dp = _carry_chain([x + y for x, y in zip(d, p)])[:LIMBS]
    return [jnp.where(neg, x, y) for x, y in zip(dp, d)]


def _mont_mul_planes(a, b, modulus: int):
    """Montgomery multiply over plane lists: the 13-bit delayed-carry
    CIOS from pallas_field (shape-agnostic; broadcasting twiddle (1, T)
    planes against (R, T) data planes works through jnp)."""
    from halo2_aes_tpu.ops.pallas_field import (mont_mul_rows, n0inv13,
                                                p13_limbs)

    shape = jnp.broadcast_shapes(a[0].shape, b[0].shape)
    if a[0].shape != shape:
        a = [jnp.broadcast_to(x, shape) for x in a]
    return mont_mul_rows(a, b, tuple(p13_limbs(modulus)), n0inv13(modulus))


def _stages(lt: int, modulus: int, get_tw, x):
    """All lt DIF stages over plane lists; shared by the Mosaic kernel
    and the eager CPU-test path (XLA CPU takes tens of minutes to
    compile the unrolled lattice, so tests must not jit it)."""
    T = 1 << lt
    p = [(modulus >> (16 * i)) & MASK for i in range(LIMBS)]
    R = x[0].shape[0]
    iota = jax.lax.broadcasted_iota(jnp.uint32, (R, T), 1)
    for s in range(lt):
        h = T >> (s + 1)
        is_lo = (iota & (2 * h - 1)) < h
        r = [_roll(pl_, -h) for pl_ in x]
        lft = [_roll(pl_, +h) for pl_ in x]
        add_l = _add_mod(x, r, p)
        sub_l = _sub_mod(lft, x, p)
        tmp = [jnp.where(is_lo, u, v) for u, v in zip(add_l, sub_l)]
        tw = [get_tw(s, i) for i in range(LIMBS)]       # (1, T) planes
        x = _mont_mul_planes(tmp, tw, modulus)
    return x


def _make_kernel(lt: int, modulus: int):
    def kernel(tw_ref, x_ref, o_ref):
        x = [x_ref[i] for i in range(LIMBS)]            # (R, T) planes
        get_tw = lambda s, i: tw_ref[s * LIMBS + i : s * LIMBS + i + 1, :]
        x = _stages(lt, modulus, get_tw, x)
        for i in range(LIMBS):
            o_ref[i] = x[i]

    return kernel


def _pass_eager(spec: F.FieldSpec, lt: int, tw: np.ndarray, x):
    """Eager (unjitted) reference path for CPU tests."""
    get_tw = lambda s, i: jnp.asarray(tw[s * LIMBS + i][None, :])
    planes = [x[i] for i in range(LIMBS)]
    out = _stages(lt, spec.modulus, get_tw, planes)
    return jnp.stack(out)


@functools.lru_cache(maxsize=None)
def _pass_fn(modulus: int, n0inv: int, lt: int, r: int, interpret: bool):
    T = 1 << lt
    kernel = _make_kernel(lt, modulus)

    def run(tw, x):                                     # x (LIMBS, rows, T)
        rows = x.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(rows // r,),
            in_specs=[
                pl.BlockSpec((lt * LIMBS, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LIMBS, r, T), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LIMBS, r, T), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((LIMBS, rows, T), jnp.uint32),
            interpret=interpret,
        )(tw, x)

    # interpret mode (CPU tests) runs the kernel eagerly: XLA CPU takes
    # minutes to compile the unrolled lattice, eager takes seconds
    return run if interpret else jax.jit(run)


def _block_rows(lt: int, rows: int) -> int:
    """Largest power-of-two block row count that divides rows and keeps
    r*T near _BLOCK_ELEMS (rows = count*n2 need not be a power of two)."""
    r = max(8, _BLOCK_ELEMS >> lt)
    pow2 = rows & -rows
    return min(r, pow2, rows)


def _pass(spec: F.FieldSpec, lt: int, inverse: bool, x):
    rows = x.shape[1]
    tw = _stage_tables(spec, lt, inverse)
    if _INTERPRET:
        return _pass_eager(spec, lt, tw, x)
    run = _pass_fn(spec.modulus, spec.n0inv, lt,
                   _block_rows(lt, rows), False)
    return run(jnp.asarray(tw), x)


def _mul_planes(spec: F.FieldSpec, a, b):
    """Elementwise Montgomery multiply of (LIMBS, N) limb-major planes."""
    if _INTERPRET:
        return F.mont_mul(spec, a.T, b.T).T
    from halo2_aes_tpu.ops import pallas_field as PF

    n = a.shape[1]
    cols = PF._canon_cols(n)
    if cols != n:
        a = jnp.pad(a, ((0, 0), (0, cols - n)))
        b = jnp.pad(b, ((0, 0), (0, cols - n)))
    nch = cols // PF.CHUNK
    run = PF._fn(spec.modulus, spec.n0inv, PF.CHUNK)
    at = jnp.moveaxis(a.reshape(LIMBS, nch, PF.CHUNK), 1, 0)
    bt = jnp.moveaxis(b.reshape(LIMBS, nch, PF.CHUNK), 1, 0)
    if nch == 1:
        out = run(at[0], bt[0])[None]
    else:
        out = jax.lax.map(lambda xs: run(*xs), (at, bt))
    return jnp.moveaxis(out, 0, 1).reshape(LIMBS, cols)[:, :n]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _split(k: int) -> int:
    """k1 (pass-1 transform log-length) — lane dims capped at _MAX_LANES."""
    k1 = (k + 1) // 2
    return k1


def ntt_flat(dom, flat, count: int, inverse: bool = False):
    """Batched size-n NTT of a FLAT (count*n, LIMBS) rows-major tensor
    (poly i at rows [i*n, (i+1)*n)), natural order in and out.  Drop-in
    for ntt.ntt over each row block; Montgomery form throughout."""
    spec, k, n = dom.spec, dom.k, dom.n
    assert flat.shape == (count * n, LIMBS)
    k1 = _split(k)
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2

    x = flat.T                                           # (16, count*n)
    x = x.reshape(LIMBS, count, n1, n2)
    x = jnp.swapaxes(x, 2, 3).reshape(LIMBS, count * n2, n1)
    x = _pass(spec, k1, inverse, x)
    x = x.reshape(LIMBS, count * n)
    mid = jnp.asarray(_mid_table(spec, k, k1, inverse))
    if count > 1:
        mid = jnp.tile(mid, (1, count))
    x = _mul_planes(spec, x, mid)
    x = x.reshape(LIMBS, count, n2, n1)
    x = jnp.swapaxes(x, 2, 3).reshape(LIMBS, count * n1, n2)
    x = _pass(spec, k2, inverse, x)
    out = x.reshape(LIMBS, count * n).T                  # (count*n, 16)
    perm = jnp.asarray(_out_perm_batch(k, k1, count))
    return jnp.take(out, perm, axis=0)
