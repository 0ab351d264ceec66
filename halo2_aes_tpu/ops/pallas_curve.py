"""Fused Pallas kernel for the complete Jacobian point adder.

The MSM's segmented scans spend their time in curve.add; with only the
multiplies in Pallas (ops/pallas_field.py) the add/sub/select chains
between them still round-trip HBM.  This kernel keeps the ENTIRE
complete adder — 16 general-case multiplies, 7 doubling multiplies, the
carry chains, and the identity/equal/negative selects — in VMEM:
one HBM read of six coordinate planes, one write of three.

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


def _p_is_zero(a):
    m = a[0:1] == 0
    for i in range(1, LIMBS):
        m = m & (a[i : i + 1] == 0)
    return m


def _p_sel(mask, a, b):
    return jnp.where(mask, a, b)


# ---- the complete adder ----------------------------------------------------

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

    # general addition (add-2007-bl shape, as in curve.py)
    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    R = sub(S2, S1)
    HH = mul(H, H)
    HHH = mul(HH, H)
    V = mul(U1, HH)
    RR = mul(R, R)
    X3 = sub(sub(RR, HHH), add(V, V))
    Y3 = sub(mul(R, sub(V, X3)), mul(S1, HHH))
    Z3 = mul(mul(Z1, Z2), H)

    # doubling branch (dbl-2009-l, as in curve.py)
    A = mul(X1, X1)
    B = mul(Y1, Y1)
    C = mul(B, B)
    XB = add(X1, B)
    t = mul(XB, XB)
    tac = sub(sub(t, A), C)
    D = add(tac, tac)
    E = add(add(A, A), A)
    Fv = mul(E, E)
    Xd = sub(Fv, add(D, D))
    C4 = add(add(C, C), add(C, C))
    C8 = add(C4, C4)
    Yd = sub(mul(E, sub(D, Xd)), C8)
    YZ = mul(Y1, Z1)
    Zd = add(YZ, YZ)

    p1_inf = _p_is_zero(Z1)
    p2_inf = _p_is_zero(Z2)
    same_x = _p_is_zero(H) & ~p1_inf & ~p2_inf
    same_y = _p_is_zero(R)
    dbl_case = same_x & same_y
    inf_case = same_x & ~same_y

    X3 = _p_sel(dbl_case, Xd, X3)
    Y3 = _p_sel(dbl_case, Yd, Y3)
    Z3 = _p_sel(dbl_case, Zd, Z3)
    Z3 = _p_sel(inf_case, jnp.zeros_like(Z3), Z3)
    X3 = _p_sel(p2_inf, X1, X3)
    Y3 = _p_sel(p2_inf, Y1, Y3)
    Z3 = _p_sel(p2_inf, Z1, Z3)
    X3 = _p_sel(p1_inf, X2, X3)
    Y3 = _p_sel(p1_inf, Y2, Y3)
    Z3 = _p_sel(p1_inf, Z2, Z3)

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
    when the XLA path should handle it (small/odd shapes, CPU)."""
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
    from halo2_aes_tpu.ops.pallas_field import _canon_cols

    cols = _canon_cols(rows)
    planes = []
    for c in (*p, *q):
        c2 = c.reshape(rows, LIMBS)
        planes.append(jnp.pad(c2, ((0, cols - rows), (0, 0))).T)
    x3, y3, z3 = _fn(cols)(*planes)
    return tuple(v.T[:rows].reshape(shape) for v in (x3, y3, z3))
