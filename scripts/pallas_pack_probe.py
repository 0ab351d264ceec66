"""Probe: sublane-packed Montgomery-mul kernel vs the current one.

The production kernel (ops/pallas_field.py) works on (1, BLK) limb row
slices; a (1, N) u32 array occupies one sublane of each (8, 128) vreg,
so ~7/8 of VPU throughput idles.  This probe re-lays the operands as
(LIMBS*8, BLK//8) — limb i occupies rows [8i, 8i+8) — so every in-kernel
value is a fully packed (8, BLK//8) tile.

Usage: python scripts/pallas_pack_probe.py [log2n] [reps]
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_aes_tpu.ops import field as F

LIMBS = F.LIMBS
MASK = 0xFFFF
BLK = 2048          # elements per grid step (same as production)
SUB = 8             # sublanes


def _kernel_packed(p_ref, n0_ref, a_ref, b_ref, o_ref):
    # a_ref: (LIMBS*SUB, BLK//SUB); limb i = rows [8i, 8i+8)
    n0 = n0_ref[0, 0]
    a = [a_ref[SUB * i : SUB * (i + 1)] for i in range(LIMBS)]
    b = [b_ref[SUB * i : SUB * (i + 1)] for i in range(LIMBS)]
    acc = [jnp.zeros_like(a[0]) for _ in range(2 * LIMBS + 1)]
    for i in range(LIMBS):
        ai = a[i]
        for j in range(LIMBS):
            t = ai * b[j]
            acc[i + j] += t & MASK
            acc[i + j + 1] += t >> 16
        m = (acc[i] * n0) & MASK
        for j in range(LIMBS):
            q = m * p_ref[j, 0]
            acc[i + j] += q & MASK
            acc[i + j + 1] += q >> 16
        acc[i + 1] += acc[i] >> 16
    limbs = []
    carry = jnp.zeros_like(acc[0])
    for i in range(LIMBS, 2 * LIMBS + 1):
        v = acc[i] + carry
        if len(limbs) < LIMBS:
            limbs.append(v & MASK)
        carry = v >> 16
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(LIMBS):
        v = limbs[i] + (1 << 16) - p_ref[i, 0] - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> 16)
    ge = borrow == 0
    o_ref[:] = jnp.concatenate(
        [jnp.where(ge, d, l) for d, l in zip(diff, limbs)], axis=0
    )


@functools.lru_cache(maxsize=None)
def _fn_packed(modulus: int, n0inv: int, cols: int):
    p_limbs = np.asarray(F.int_to_limbs(modulus), np.uint32).reshape(LIMBS, 1)
    n0 = np.array([[n0inv]], np.uint32)
    c8 = cols // SUB

    @jax.jit
    def run(at, bt):
        # at/bt: (LIMBS, cols) -> (LIMBS*SUB, cols//SUB)
        ap = at.reshape(LIMBS * SUB, c8)
        bp = bt.reshape(LIMBS * SUB, c8)
        out = pl.pallas_call(
            _kernel_packed,
            grid=(cols // BLK,),
            in_specs=[
                pl.BlockSpec((LIMBS, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((LIMBS * SUB, BLK // SUB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LIMBS * SUB, BLK // SUB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LIMBS * SUB, BLK // SUB),
                                   lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((LIMBS * SUB, c8), jnp.uint32),
        )(jnp.asarray(p_limbs), jnp.asarray(n0), ap, bp)
        return out.reshape(LIMBS, cols)

    return run


# ---------------------------------------------------------------------------
# variant 2: 13-bit-limb delayed-carry CIOS (packed layout)
#
# Repack 16x16-bit limbs to 20x13-bit IN-KERNEL; products are <= 26
# bits, so columns accumulate up to ~40 of them in u32 WITHOUT the
# mask/shift carry split after every product (the 16-bit kernel's 4
# extra ops per product).  Montgomery digit = 13 bits, R' = 2^260; the
# 2^-260 vs the external 2^-256 form is compensated by repacking
# 16*a (a 4-bit-shifted window extraction, same op count).
# ---------------------------------------------------------------------------

D = 13
DLIMBS = 20
DMASK = (1 << D) - 1


def _repack13(limbs16, shift: int):
    """16 x (8, C) 16-bit rows -> 20 x (8, C) 13-bit rows of the value
    << shift.  Window j covers source bits [13j - shift, 13j - shift + 13)."""
    out = []
    for j in range(DLIMBS):
        lo_bit = 13 * j - shift
        acc = None
        for i in range(LIMBS):
            base = 16 * i
            if base + 16 <= lo_bit or base >= lo_bit + D:
                continue
            off = lo_bit - base
            piece = (limbs16[i] >> off) if off >= 0 else (limbs16[i] << -off)
            acc = piece if acc is None else (acc | piece)
        out.append((acc if acc is not None else jnp.zeros_like(limbs16[0]))
                   & DMASK)
    return out


def _repack16(limbs13):
    """20 x 13-bit rows (values < 2^13) -> 16 x 16-bit rows."""
    out = []
    for i in range(LIMBS):
        lo_bit = 16 * i
        acc = None
        for j in range(DLIMBS):
            base = 13 * j
            if base + D <= lo_bit or base >= lo_bit + 16:
                continue
            off = base - lo_bit
            piece = (limbs13[j] << off) if off >= 0 else (limbs13[j] >> -off)
            acc = piece if acc is None else (acc + piece)
        out.append(acc & MASK)
    return out


def _kernel13(p_ref, n0_ref, a_ref, b_ref, o_ref):
    # p_ref: (DLIMBS, 1) 13-bit limbs of the modulus; n0_ref: -p^-1 mod 2^13
    n0 = n0_ref[0, 0]
    a16 = [a_ref[SUB * i : SUB * (i + 1)] for i in range(LIMBS)]
    b16 = [b_ref[SUB * i : SUB * (i + 1)] for i in range(LIMBS)]
    a = _repack13(a16, 4)          # 16*a: compensates R'=2^260 vs R=2^256
    b = _repack13(b16, 0)
    acc = [jnp.zeros_like(a[0]) for _ in range(2 * DLIMBS + 1)]
    for i in range(DLIMBS):
        ai = a[i]
        for j in range(DLIMBS):
            acc[i + j] += ai * b[j]
        m = (acc[i] * n0) & DMASK
        for j in range(DLIMBS):
            acc[i + j] += m * p_ref[j, 0]
        acc[i + 1] += acc[i] >> D
    # carry-normalize the upper half; result < 2p
    limbs = []
    carry = jnp.zeros_like(acc[0])
    for i in range(DLIMBS, 2 * DLIMBS + 1):
        v = acc[i] + carry
        if len(limbs) < DLIMBS:
            limbs.append(v & DMASK)
        carry = v >> D
    # conditional subtract p (13-bit borrow chain)
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(DLIMBS):
        v = limbs[i] + (1 << D) - p_ref[i, 0] - borrow
        diff.append(v & DMASK)
        borrow = 1 - (v >> D)
    ge = borrow == 0
    res = [jnp.where(ge, d, l) for d, l in zip(diff, limbs)]
    o_ref[:] = jnp.concatenate(_repack16(res), axis=0)


def _p13(modulus: int):
    return [(modulus >> (D * j)) & DMASK for j in range(DLIMBS)]


@functools.lru_cache(maxsize=None)
def _fn13(modulus: int, cols: int):
    p_limbs = np.asarray(_p13(modulus), np.uint32).reshape(DLIMBS, 1)
    n0 = np.array([[(-pow(modulus, -1, 1 << D)) % (1 << D)]], np.uint32)
    c8 = cols // SUB

    @jax.jit
    def run(at, bt):
        ap = at.reshape(LIMBS * SUB, c8)
        bp = bt.reshape(LIMBS * SUB, c8)
        out = pl.pallas_call(
            _kernel13,
            grid=(cols // BLK,),
            in_specs=[
                pl.BlockSpec((DLIMBS, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((LIMBS * SUB, BLK // SUB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LIMBS * SUB, BLK // SUB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LIMBS * SUB, BLK // SUB),
                                   lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((LIMBS * SUB, c8), jnp.uint32),
        )(jnp.asarray(p_limbs), jnp.asarray(n0), ap, bp)
        return out.reshape(LIMBS, cols)

    return run


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = 1 << lg
    spec = F.FR

    import random

    rnd = random.Random(0)
    av = [rnd.randrange(spec.modulus) for _ in range(n)]
    bv = [rnd.randrange(spec.modulus) for _ in range(n)]
    a = jnp.asarray(spec.encode(av))
    b = jnp.asarray(spec.encode(bv))
    at = a.T.copy()     # (16, n) limb-major
    bt = b.T.copy()

    # -- packed kernel ------------------------------------------------
    run_p = _fn_packed(spec.modulus, spec.n0inv, n)
    out = np.asarray(run_p(at, bt))
    got = spec.decode(np.ascontiguousarray(out.T))
    want = [(x * y) % spec.modulus for x, y in zip(av, bv)]
    assert got == want, "packed kernel mismatch"
    print("packed kernel correct")

    # chain CH applications inside one jit so the tunnel transfer (8 MB
    # over a network link) stops dominating the timing; move only a
    # (16,) slice back.
    CH = 32

    def chained(run):
        @jax.jit
        def f(at, bt):
            cur = at
            for _ in range(CH):
                cur = run(cur, bt)
            return cur[:, :1]

        return f

    from halo2_aes_tpu.ops import pallas_field as PF

    run_13 = _fn13(spec.modulus, n)
    out = np.asarray(run_13(at, bt))
    got = spec.decode(np.ascontiguousarray(out.T))
    assert got == want, "13-bit kernel mismatch"
    print("13-bit kernel correct")

    run_c = PF._fn(spec.modulus, spec.n0inv, n)
    for name, run in (("packed13", run_13), ("packed", run_p),
                      ("current", run_c)):
        f = chained(run)
        np.asarray(f(at, bt))  # compile
        t0 = time.time()
        for _ in range(reps):
            out = np.asarray(f(at, bt))
        dt = (time.time() - t0) / reps / CH
        print(f"{name:8s} {dt*1e3:.3f} ms / 2^{lg} muls "
              f"({(1 << lg) / dt / 1e6:.0f} Mmul/s)")


if __name__ == "__main__":
    main()
