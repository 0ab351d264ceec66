"""Fused Pallas kernel for the complete projective point adder.

The MSM's reduction trees spend their time in curve.add; with only the
multiplies in Pallas (ops/pallas_field.py) the add/sub chains between
them still round-trip HBM.  This kernel keeps the ENTIRE
Renes-Costello-Batina complete adder (a=0, alg. 7: 12 general
multiplies + b3 add-chains) in VMEM: one HBM read of six coordinate
planes, one write of three.  Being exception-free, the kernel needs no
identity/equal/negative select logic at all — the dataflow IS the
group law.

Same algorithm as ops/curve.py add() (kept in lockstep; tests compare
the two).  Field elements are limb-major (16, BLK) u32 planes.
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
BLK = 1024

_ENABLED = False
_MIN_ROWS = 4096


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


# ---- in-kernel field helpers on (16, B) planes ----------------------------

def _p_mul(a, b, p_ref, n0):
    acc = [jnp.zeros((1, a.shape[1]), jnp.uint32) for _ in range(2 * LIMBS + 1)]
    for i in range(LIMBS):
        ai = a[i : i + 1]
        for j in range(LIMBS):
            t = ai * b[j : j + 1]
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
    return _cond_sub_p(limbs, p_ref)


def _cond_sub_p(limbs, p_ref):
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(LIMBS):
        v = limbs[i] + (1 << 16) - p_ref[i, 0] - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> 16)
    ge = borrow == 0
    return jnp.concatenate(
        [jnp.where(ge, d, l) for d, l in zip(diff, limbs)], axis=0
    )


def _p_add(a, b, p_ref):
    carry = jnp.zeros((1, a.shape[1]), jnp.uint32)
    s = []
    for i in range(LIMBS):
        v = a[i : i + 1] + b[i : i + 1] + carry
        s.append(v & MASK)
        carry = v >> 16
    return _cond_sub_p(s, p_ref)


def _p_sub(a, b, p_ref):
    borrow = jnp.zeros((1, a.shape[1]), jnp.uint32)
    d = []
    for i in range(LIMBS):
        v = a[i : i + 1] + (1 << 16) - b[i : i + 1] - borrow
        d.append(v & MASK)
        borrow = 1 - (v >> 16)
    # if borrowed, add p back
    carry = jnp.zeros_like(borrow)
    dp = []
    for i in range(LIMBS):
        v = d[i] + p_ref[i, 0] + carry
        dp.append(v & MASK)
        carry = v >> 16
    under = borrow == 1
    return jnp.concatenate(
        [jnp.where(under, x, y) for x, y in zip(dp, d)], axis=0
    )


# ---- the RCB complete adder ------------------------------------------------

def _kernel(p_ref, n0_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
            x3_ref, y3_ref, z3_ref):
    n0 = n0_ref[0, 0]
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]

    def mul(a, b):
        return _p_mul(a, b, p_ref, n0)

    def add(a, b):
        return _p_add(a, b, p_ref)

    def sub(a, b):
        return _p_sub(a, b, p_ref)

    def mul_b3(a):  # 9a = 8a + a
        a2 = add(a, a)
        a4 = add(a2, a2)
        return add(add(a4, a4), a)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    A = mul(add(X1, Y1), add(X2, Y2))
    B = mul(add(Y1, Z1), add(Y2, Z2))
    C = mul(add(X1, Z1), add(X2, Z2))
    t3 = sub(sub(A, t0), t1)
    t4 = sub(sub(B, t1), t2)
    xz = sub(sub(C, t0), t2)
    t0_3 = add(add(t0, t0), t0)
    t2_b = mul_b3(t2)
    z3t = add(t1, t2_b)
    t1m = sub(t1, t2_b)
    y3b = mul_b3(xz)

    X3 = sub(mul(t3, t1m), mul(t4, y3b))
    Y3 = add(mul(t1m, z3t), mul(y3b, t0_3))
    Z3 = add(mul(z3t, t4), mul(t0_3, t3))

    x3_ref[:] = X3
    y3_ref[:] = Y3
    z3_ref[:] = Z3


@functools.lru_cache(maxsize=None)
def _fn(cols: int):
    q = F.FQ
    p_limbs = np.asarray(F.int_to_limbs(q.modulus), np.uint32).reshape(LIMBS, 1)
    n0 = np.array([[q.n0inv]], np.uint32)
    plane = lambda: pl.BlockSpec((LIMBS, BLK), lambda i: (0, i),  # noqa: E731
                                 memory_space=pltpu.VMEM)

    @jax.jit
    def run(*coords):
        return pl.pallas_call(
            _kernel,
            grid=(cols // BLK,),
            in_specs=[
                pl.BlockSpec((LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ] + [plane() for _ in range(6)],
            out_specs=tuple(plane() for _ in range(3)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((LIMBS, cols), jnp.uint32) for _ in range(3)
            ),
        )(jnp.asarray(p_limbs), jnp.asarray(n0), *coords)

    return run


def maybe_add(p, q):
    """Fused complete add for batched (N, 16) coordinate triples; None
    when the XLA path should handle it (small/odd shapes, CPU).

    Runs as fixed-width chunks over ONE compiled kernel shape
    (pallas_field._chunked) so Mosaic compiles exactly once."""
    if not _ENABLED or jax.default_backend() == "cpu":
        return None
    shapes = {c.shape for c in (*p, *q)}
    if len(shapes) != 1:
        return None
    (shape,) = shapes
    if shape[-1] != LIMBS or len(shape) < 2:
        return None
    rows = int(np.prod(shape[:-1], dtype=np.int64))
    if rows < _MIN_ROWS:
        return None
    from halo2_aes_tpu.ops.pallas_field import CHUNK, _chunked

    planes = [c.reshape(rows, LIMBS) for c in (*p, *q)]
    x3, y3, z3 = _chunked(_fn(CHUNK), planes, rows)
    return tuple(v.reshape(shape) for v in (x3, y3, z3))
