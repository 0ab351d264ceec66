"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA limb kernels in ops/field.py are correct everywhere but leave
TPU performance on the table: compact (fori_loop) mode spills the
33-column accumulator to HBM on every loop step, and unrolled mode
takes tens of minutes of XLA compile on this host.  The Pallas kernel
gets both: the fully unrolled 16x16 CIOS lattice lives INSIDE one
kernel (Mosaic compiles straight-line vector code quickly) and the
accumulator stays in VMEM/registers.

Layout: limb-major (16, N) u32 — each limb row occupies full vector
lanes.  The wrapper transposes at the XLA level and pads N to the block
size.  Enable with ``set_enabled(True)`` (prove.py does this on TPU);
``field.mont_mul`` is unchanged — callers opt in via ``mont_mul`` here.
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
MASK = 0xFFFF  # python int: weak-typed inside the kernel (no captured consts)
BLK = 2048  # columns per grid step: 3 x (16, 2048) u32 = 384 KB VMEM

_ENABLED = False


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def _kernel(p_ref, n0_ref, a_ref, b_ref, o_ref):
    a = a_ref[:]          # (16, BLK)
    b = b_ref[:]
    n0 = n0_ref[0, 0]

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

    # carry-normalize upper half (result < 2p)
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
        v = limbs[i] + (1 << 16) - p_ref[i, 0] - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> 16)
    ge = borrow == 0
    o_ref[:] = jnp.concatenate(
        [jnp.where(ge, d, l) for d, l in zip(diff, limbs)], axis=0
    )


@functools.lru_cache(maxsize=None)
def _fn(modulus: int, n0inv: int, cols: int):
    import numpy as np

    p_limbs = np.asarray(F.int_to_limbs(modulus), np.uint32).reshape(LIMBS, 1)
    n0 = np.array([[n0inv]], np.uint32)

    @jax.jit
    def run(at, bt):
        return pl.pallas_call(
            _kernel,
            grid=(cols // BLK,),
            in_specs=[
                pl.BlockSpec((LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((LIMBS, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((LIMBS, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LIMBS, BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((LIMBS, cols), jnp.uint32),
        )(jnp.asarray(p_limbs), jnp.asarray(n0), at, bt)

    return run


_MIN_ROWS = 4096  # below this the XLA path's dispatch is cheaper

# Every Pallas invocation runs on EXACTLY this many columns; larger
# batches are processed as a lax.map over chunks.  One shape -> ONE
# Mosaic kernel compile for the process lifetime (remote Mosaic
# compiles cost minutes each; round-1 padded per-size and paid one
# compile per distinct size).  2^15 balances pad waste on mid-size
# reduction-tree levels against per-chunk launch overhead.
CHUNK = 1 << 15


def available(a, b) -> bool:
    return (
        a.shape[-1] == LIMBS
        and b.shape[-1] == LIMBS
        and jax.default_backend() != "cpu"
    )


def _canon_cols(n: int) -> int:
    """Pad to a multiple of the fixed chunk width."""
    return -(-n // CHUNK) * CHUNK


def _chunked(fn_one, planes, n_out: int):
    """Run a fixed-(LIMBS, CHUNK) pallas callable over column chunks.

    planes: list of (rows, LIMBS) arrays (row-major); returns the
    fn_one outputs restacked to (n_out rows, LIMBS) each."""
    rows = planes[0].shape[0]
    cols = _canon_cols(rows)
    nch = cols // CHUNK
    staged = []
    for p in planes:
        pt = jnp.pad(p, ((0, cols - rows), (0, 0))).T      # (LIMBS, cols)
        staged.append(
            jnp.moveaxis(pt.reshape(LIMBS, nch, CHUNK), 1, 0))  # (nch, L, C)
    if nch == 1:
        outs = fn_one(*(s[0] for s in staged))
        outs = outs if isinstance(outs, tuple) else (outs,)
        outs = tuple(o[None] for o in outs)
    else:
        outs = jax.lax.map(lambda xs: fn_one(*xs), tuple(staged))
        if not isinstance(outs, tuple):
            outs = (outs,)
    flat = tuple(
        jnp.moveaxis(o, 0, 1).reshape(LIMBS, cols).T[:n_out] for o in outs
    )
    return flat if len(flat) > 1 else flat[0]


def _mul2d(spec: F.FieldSpec, a, b):
    n = a.shape[0]
    run = _fn(spec.modulus, spec.n0inv, CHUNK)
    return _chunked(run, [a, b], n)


def maybe_mont_mul(spec: F.FieldSpec, a, b):
    """Pallas Montgomery multiply for large batched operands, handling
    leading-dim flattening and operand broadcasting; returns None when
    the XLA path should be used instead (small/odd shapes, CPU)."""
    if not available(a, b):
        return None
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    rows = int(np.prod(shape[:-1], dtype=np.int64)) if len(shape) > 1 else 0
    if rows < _MIN_ROWS:
        return None
    a2 = jnp.broadcast_to(a, shape).reshape(rows, LIMBS)
    b2 = jnp.broadcast_to(b, shape).reshape(rows, LIMBS)
    return _mul2d(spec, a2, b2).reshape(shape)


def mont_mul(spec: F.FieldSpec, a, b):
    """Direct entry point (tests/benches); gated by set_enabled."""
    out = maybe_mont_mul(spec, a, b) if _ENABLED else None
    if out is None:
        return F.mont_mul(spec, a, b)
    return out


def enable_in_field_ops(ntt: bool = False) -> None:
    """Route field.mont_mul's large multiplies and curve.add's large
    batches through the Pallas kernels.  ``ntt=True`` additionally
    routes the grouped batched transforms (ops/ntt.ntt_many) through
    the fused four-step Pallas NTT — more Mosaic call sites, so longer
    cold compiles (see memory/tpu-pallas-compile-rules); enable for
    steady-state serving."""
    from halo2_aes_tpu.ops import pallas_curve

    set_enabled(True)
    F.set_pallas(True)
    pallas_curve.set_enabled(True)
    if ntt:
        from halo2_aes_tpu.ops import pallas_ntt

        pallas_ntt.set_enabled(True)
