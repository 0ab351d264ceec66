"""Microprobe: raw u32 multiply throughput inside a Pallas TPU kernel.

Times kernels that do ONLY k multiplies (+1 add each to keep them live)
per element, for k = 64/256/512, plus a u16-product variant (operands
provably < 2^16 via & 0xFFFF before the multiply) to see whether Mosaic
narrows the multiplier.  Usage: python scripts/mul_throughput_probe.py
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

LIMBS = 16
SUB = 8
N = 1 << 17


def _mk_kernel(k_mults: int, mask16: bool):
    def kern(a_ref, b_ref, o_ref):
        a = [a_ref[SUB * i : SUB * (i + 1)] for i in range(LIMBS)]
        b = [b_ref[SUB * i : SUB * (i + 1)] for i in range(LIMBS)]
        if mask16:
            a = [x & 0xFFFF for x in a]
            b = [x & 0xFFFF for x in b]
        # 33 independent accumulators, like the CIOS lattice
        accs = [jnp.zeros_like(a[0]) for _ in range(33)]
        for t in range(k_mults):
            i, j = t % LIMBS, (t // LIMBS) % LIMBS
            accs[(i + j) % 33] += a[i] * b[j]
        out = accs[0]
        for x in accs[1:]:
            out += x
        o_ref[:] = jnp.concatenate([out] * LIMBS, axis=0)

    return kern


@functools.lru_cache(maxsize=None)
def _fn(k_mults: int, mask16: bool, blk: int):
    c8 = N // SUB

    @jax.jit
    def run(ap, bp):
        BLK = blk
        return pl.pallas_call(
            _mk_kernel(k_mults, mask16),
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((LIMBS * SUB, BLK // SUB), lambda i, BLK=BLK: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LIMBS * SUB, BLK // SUB), lambda i, BLK=BLK: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LIMBS * SUB, BLK // SUB),
                                   lambda i, BLK=BLK: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((LIMBS * SUB, c8), jnp.uint32),
        )(ap, bp)

    return run


def main():
    rng = np.random.default_rng(0)
    ap = jnp.asarray(rng.integers(0, 1 << 16, (LIMBS * SUB, N // SUB),
                                  dtype=np.uint32))
    bp = jnp.asarray(rng.integers(0, 1 << 16, (LIMBS * SUB, N // SUB),
                                  dtype=np.uint32))
    CH = 16
    for blk in (2048, 8192, 16384):
        for k in (64, 512):
            run = _fn(k, False, blk)

            @jax.jit
            def f(a, b, run=run):
                cur = a
                for _ in range(CH):
                    cur = run(cur, b)
                return cur[:1, :1]

            np.asarray(f(ap, bp))
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                np.asarray(f(ap, bp))
            dt = (time.time() - t0) / reps / CH
            rate = N * k / dt / 1e9
            print(f"blk={blk:5d} k={k:4d}: {dt*1e3:7.3f} ms "
                  f"-> {rate:6.1f} Gmul/s", flush=True)


if __name__ == "__main__":
    main()
