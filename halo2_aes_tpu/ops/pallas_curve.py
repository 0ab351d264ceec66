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
the two).  Field elements are SUBLANE-PACKED (LIMBS*8, B/8) u32 planes
(limb i = rows [8i, 8i+8)); the multiplies run the 13-bit delayed-carry
CIOS from pallas_field (see its module docstring for the layout and
radix rationale), while the add/sub carry chains stay 16-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops.pallas_field import (
    LIMBS,
    MASK,
    SUB,
    mont_mul_rows,
    n0inv13,
    p13_limbs,
    packed_spec,
    _rows_of,
)

BLK = 1024

_ENABLED = False
_MIN_ROWS = 4096


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


# ---- in-kernel field helpers on lists of (8, B) 16-bit rows ---------------

def _p16_limbs(modulus: int):
    return [(modulus >> (16 * i)) & MASK for i in range(LIMBS)]


def _cond_sub_p(limbs, p16):
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(LIMBS):
        v = limbs[i] + (1 << 16) - p16[i] - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> 16)
    ge = borrow == 0
    return [jnp.where(ge, d, l) for d, l in zip(diff, limbs)]


def _p_add(a, b, p16):
    carry = jnp.zeros_like(a[0])
    s = []
    for i in range(LIMBS):
        v = a[i] + b[i] + carry
        s.append(v & MASK)
        carry = v >> 16
    return _cond_sub_p(s, p16)


def _p_sub(a, b, p16):
    borrow = jnp.zeros_like(a[0])
    d = []
    for i in range(LIMBS):
        v = a[i] + (1 << 16) - b[i] - borrow
        d.append(v & MASK)
        borrow = 1 - (v >> 16)
    # if borrowed, add p back
    carry = jnp.zeros_like(borrow)
    dp = []
    for i in range(LIMBS):
        v = d[i] + p16[i] + carry
        dp.append(v & MASK)
        carry = v >> 16
    under = borrow == 1
    return [jnp.where(under, x, y) for x, y in zip(dp, d)]


# ---- the RCB complete adder ------------------------------------------------

def _make_kernel(p16, p13, n0):
    def _kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                x3_ref, y3_ref, z3_ref):
        X1, Y1, Z1 = _rows_of(x1_ref), _rows_of(y1_ref), _rows_of(z1_ref)
        X2, Y2, Z2 = _rows_of(x2_ref), _rows_of(y2_ref), _rows_of(z2_ref)

        def mul(a, b):
            return mont_mul_rows(a, b, p13, n0)

        def add(a, b):
            return _p_add(a, b, p16)

        def sub(a, b):
            return _p_sub(a, b, p16)

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

        x3_ref[:] = jnp.concatenate(X3, axis=0)
        y3_ref[:] = jnp.concatenate(Y3, axis=0)
        z3_ref[:] = jnp.concatenate(Z3, axis=0)

    return _kernel


@functools.lru_cache(maxsize=None)
def _fn(cols: int):
    q = F.FQ
    p16 = tuple(_p16_limbs(q.modulus))
    p13 = tuple(p13_limbs(q.modulus))
    n0 = n0inv13(q.modulus)
    c8 = cols // SUB

    @jax.jit
    def run(*coords):
        outs = pl.pallas_call(
            _make_kernel(p16, p13, n0),
            grid=(cols // BLK,),
            in_specs=[packed_spec(BLK) for _ in range(6)],
            out_specs=tuple(packed_spec(BLK) for _ in range(3)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((LIMBS * SUB, c8), jnp.uint32)
                for _ in range(3)
            ),
        )(*(c.reshape(LIMBS * SUB, c8) for c in coords))
        return tuple(o.reshape(LIMBS, cols) for o in outs)

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
