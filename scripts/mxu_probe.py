"""Measure the MXU int8-matmul field path against the VPU limb kernel.

Usage: python scripts/mxu_probe.py [log2n] [reps]

Reports, for a 2^log2n batch on the attached device:
  * mont_mul_fast (the production VPU/Pallas kernel)       [Mmul/s]
  * mxu_field.FixedMul (one fixed operand, 3 int8 matmuls) [Mmul/s]
  * mxu_field.DftMatmul(16) — effective rate counting the
    16^2 fixed-operand products each call performs          [Mmul/s]

This is the evidence row for BASELINE.md's roofline section: the named
>=7.5x/chip move is moving fixed-operand muls (NTT twiddle stages)
from the VPU limb kernel to MXU int8 matmuls.
"""

import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops import mxu_field as MX


def timed(fn, reps):
    np.asarray(fn()).ravel()[:1]  # compile + warm; forced transfer
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    # block_until_ready is NOT a reliable sync over the axon tunnel
    # (.claude/skills/verify): force a transfer before reading the timer.
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n = 1 << log2n
    spec = F.FR
    rng = random.Random(7)
    print(f"device: {jax.devices()[0]}  batch 2^{log2n}  reps {reps}")

    a = jnp.asarray(
        F.ints_to_limbs_fast([rng.randrange(spec.modulus) for _ in range(n)]))
    b_val = rng.randrange(spec.modulus)
    b = jnp.broadcast_to(jnp.asarray(F.int_to_limbs(b_val)), a.shape)

    vpu = jax.jit(lambda x, y: F.mont_mul_fast(spec, x, y))
    dt = timed(lambda: vpu(a, b), reps)
    print(f"VPU mont_mul_fast       : {dt*1e3:8.2f} ms  "
          f"{n/dt/1e6:8.1f} Mmul/s")

    fixed = MX.FixedMul(spec, b_val)
    fx = jax.jit(fixed.__call__)
    dt = timed(lambda: fx(a), reps)
    print(f"MXU FixedMul            : {dt*1e3:8.2f} ms  "
          f"{n/dt/1e6:8.1f} Mmul/s")

    ndft = 16
    omega = pow(spec.generator, (spec.modulus - 1) // ndft, spec.modulus)
    w = [[pow(omega, j * k, spec.modulus) for k in range(ndft)]
         for j in range(ndft)]
    dft = MX.DftMatmul(spec, w)
    xv = a.reshape(n // ndft, ndft, F.LIMBS)
    dj = jax.jit(dft.__call__)
    dt = timed(lambda: dj(xv), reps)
    muls = n * ndft  # n/16 vectors x 16^2 products
    print(f"MXU DftMatmul(16)       : {dt*1e3:8.2f} ms  "
          f"{muls/dt/1e6:8.1f} Mmul/s effective "
          f"({n/ndft:.0f} x 16-point DFTs)")

    nv = n // 256
    xv2 = a.reshape(nv, 256, F.LIMBS)
    nj = jax.jit(lambda v: MX.ntt256(spec, v))
    dt = timed(lambda: nj(xv2), reps)
    muls2 = nv * 2 * 16 * 256  # two stages of 16 DFT-16s per vector
    print(f"MXU ntt256 (2 matmuls)  : {dt*1e3:8.2f} ms  "
          f"{muls2/dt/1e6:8.1f} Mmul/s effective "
          f"({nv} x 256-point NTTs = {nv*256/dt/1e6:.1f} Mpt/s)")

    # correctness spot check on-device
    got = np.asarray(fx(a[:8]))
    want = np.asarray(F.mont_mul(spec, a[:8], b[:8]))
    assert got.tolist() == want.tolist(), "FixedMul mismatch on device"
    print("on-device correctness: ok")


if __name__ == "__main__":
    main()
