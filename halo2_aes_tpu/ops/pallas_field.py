"""Pallas TPU kernels for batched field arithmetic.

The XLA limb kernels in ops/field.py are correct everywhere but leave
TPU performance on the table: (N, 16) u32 arrays use 16 of 128 lanes,
and XLA's fusion of the 16x16 product lattice is compile-bound.  The
Pallas path processes one (BLK, 16) block per grid step, transposes it
to limb-major (16, BLK) in VMEM — every limb row then occupies full
vector lanes — and runs the fully unrolled CIOS Montgomery multiply in
registers.  One kernel = one HBM round trip per operand.

Used (when enabled via ``use_pallas``) by the NTT butterfly multiply and
the elementwise product paths; falls back to ops/field.py on non-TPU
backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_aes_tpu.ops import field as F

LIMBS = F.LIMBS
MASK = jnp.uint32(F.LIMB_MASK)

_BLK = 1024  # batch rows per grid step: 2 x (1024,16) u32 in + 1 out ~ 192KB VMEM


def _mont_mul_kernel(p_ref, n0_ref, a_ref, b_ref, o_ref):
    """One block: o = a * b * R^-1 mod p (canonical)."""
    a = a_ref[:].T  # (16, BLK) limb-major
    b = b_ref[:].T
    n = p_ref[:]    # (16, 1) -> broadcast rows
    n0 = n0_ref[0]

    acc = [jnp.zeros_like(a[0]) for _ in range(2 * LIMBS + 1)]
    for i in range(LIMBS):
        ai = a[i]
        for j in range(LIMBS):
            t = ai * b[j]
            acc[i + j] = acc[i + j] + (t & MASK)
            acc[i + j + 1] = acc[i + j + 1] + (t >> 16)
        m = (acc[i] * n0) & MASK
        for j in range(LIMBS):
            q = m * n[j, 0]
            acc[i + j] = acc[i + j] + (q & MASK)
            acc[i + j + 1] = acc[i + j + 1] + (q >> 16)
        acc[i + 1] = acc[i + 1] + (acc[i] >> 16)

    # carry-normalize the upper half -> r < 2p
    limbs = []
    carry = jnp.zeros_like(acc[0])
    for i in range(LIMBS, 2 * LIMBS + 1):
        v = acc[i] + carry
        if len(limbs) < LIMBS:
            limbs.append(v & MASK)
        carry = v >> 16

    # conditional subtract p
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(LIMBS):
        v = limbs[i] + jnp.uint32(1 << 16) - n[i, 0] - borrow
        diff.append(v & MASK)
        borrow = jnp.uint32(1) - (v >> 16)
    ge = borrow == 0
    out = [jnp.where(ge, d, l) for d, l in zip(diff, limbs)]
    o_ref[:] = jnp.stack(out, axis=0).T


@functools.lru_cache(maxsize=None)
def _mont_mul_fn(modulus: int, n0inv: int, n_rows: int):
    import numpy as np

    p_limbs = np.asarray(F.int_to_limbs(modulus), np.uint32).reshape(LIMBS, 1)
    grid = n_rows // _BLK

    def fn(a, b):
        return pl.pallas_call(
            functools.partial(_mont_mul_kernel),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_BLK, LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLK, LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BLK, LIMBS), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LIMBS), jnp.uint32),
        )(jnp.asarray(p_limbs), jnp.asarray([n0inv], jnp.uint32), a, b)

    return fn


def mont_mul(spec: F.FieldSpec, a, b):
    """Pallas Montgomery multiply for 2-D (N, 16) inputs, N % 1024 == 0.

    Falls back to the XLA path for other shapes/platforms."""
    if (
        a.ndim == 2
        and b.shape == a.shape
        and a.shape[0] % _BLK == 0
        and jax.default_backend() != "cpu"
    ):
        return _mont_mul_fn(spec.modulus, spec.n0inv, a.shape[0])(a, b)
    return F.mont_mul(spec, a, b)
