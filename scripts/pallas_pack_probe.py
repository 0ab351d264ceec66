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


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = 1 << lg
    spec = F.FR

    rng = np.random.default_rng(0)
    av = [int(x) for x in rng.integers(1, spec.modulus, n, dtype=np.uint64)]
    bv = [int(x) for x in rng.integers(1, spec.modulus, n, dtype=np.uint64)]
    a = jnp.asarray(spec.encode(av))
    b = jnp.asarray(spec.encode(bv))
    at = a.T.copy()     # (16, n) limb-major
    bt = b.T.copy()

    # -- packed kernel ------------------------------------------------
    run_p = _fn_packed(spec.modulus, spec.n0inv, n)
    out = np.asarray(run_p(at, bt))
    got = spec.decode(np.ascontiguousarray(out.T))
    R = 1 << 256
    rinv = pow(R, -1, spec.modulus)
    want = [(x * y * rinv) % spec.modulus for x, y in zip(av, bv)]
    assert got == want, "packed kernel mismatch"
    print("packed kernel correct")
    t0 = time.time()
    for _ in range(reps):
        out = np.asarray(run_p(at, bt))
    print(f"packed:   {(time.time()-t0)/reps*1e3:.2f} ms / 2^{lg} muls")

    # -- production kernel --------------------------------------------
    from halo2_aes_tpu.ops import pallas_field as PF

    run_c = PF._fn(spec.modulus, spec.n0inv, n)
    out = np.asarray(run_c(at, bt))
    t0 = time.time()
    for _ in range(reps):
        out = np.asarray(run_c(at, bt))
    print(f"current:  {(time.time()-t0)/reps*1e3:.2f} ms / 2^{lg} muls")


if __name__ == "__main__":
    main()
