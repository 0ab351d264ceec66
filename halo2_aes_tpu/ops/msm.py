"""Multi-scalar multiplication (Pippenger) on TPU.

The commitment engine's core op (role of halo2's best_multiexp,
SURVEY.md section 2.13 item 3: "advice commitments (MSM)").  CPU/GPU
Pippenger scatters points into buckets; TPU has no fast scatter, so each
window instead does

  1. argsort point indices by digit                    (one u32 sort),
  2. segmented inclusive scan with the complete Jacobian
     adder as combiner -> per-bucket sums at segment ends,
  3. suffix-sum of buckets via a reversed associative_scan
     (turns sum_b b*B_b into a sum of suffix sums),
  4. Horner window fold: acc = 2^c * acc + S_w.

Everything is one ``lax.scan`` over windows, so the traced graph holds a
single window body regardless of scalar width.

Scalars are PLAIN (non-Montgomery) Fr limb vectors; points are affine
Montgomery Fq limb pairs (no identities — SRS points never are).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from halo2_aes_tpu.ops import curve as CV
from halo2_aes_tpu.ops import field as F

SCALAR_BITS = 254


def default_window(n: int) -> int:
    """Window size balancing 2n seg-scan adds vs 2*2^c bucket adds."""
    return int(np.clip(int(np.log2(max(n, 2))) - 3, 4, 13))


def digit_matrix(scalars, c: int):
    """(n, 16) plain limbs -> (windows, n) int32 window digits, LSB first."""
    windows = -(-SCALAR_BITS // c)
    mask = jnp.uint32((1 << c) - 1)
    rows = []
    for w in range(windows):
        start = w * c
        l, off = divmod(start, F.LIMB_BITS)
        v = scalars[..., l] >> off
        got = F.LIMB_BITS - off
        while got < c and l + 1 < F.LIMBS:
            l += 1
            v = v | (scalars[..., l] << got)
            got += F.LIMB_BITS
        rows.append((v & mask).astype(jnp.int32))
    return jnp.stack(rows)


def _tree_add(pts):
    """Fold a stacked point array (m, ..., LIMBS) down axis 0 with the
    complete adder: log2(m) sequential levels."""
    x, y, z = pts
    m = x.shape[0]
    while m > 1:
        half = m // 2
        lo = (x[:half], y[:half], z[:half])
        hi = (x[half : 2 * half], y[half : 2 * half], z[half : 2 * half])
        s = CV.add(lo, hi)
        x = jnp.concatenate([s[0], x[2 * half :]], axis=0)
        y = jnp.concatenate([s[1], y[2 * half :]], axis=0)
        z = jnp.concatenate([s[2], z[2 * half :]], axis=0)
        m = x.shape[0]
    return (x[0], y[0], z[0])


def _seg_combine(a, b):
    """Segmented-scan monoid over (X, Y, Z, seg_id)."""
    ax, ay, az, aseg = a
    bx, by, bz, bseg = b
    s = CV.add((ax, ay, az), (bx, by, bz))
    same = aseg == bseg
    return (
        F.select(same, s[0], bx),
        F.select(same, s[1], by),
        F.select(same, s[2], bz),
        bseg,
    )


@functools.partial(jax.jit, static_argnames=("c",))
def msm(points, scalars, c: int | None = None):
    """sum_i scalars[i] * points[i].

    points:  (x, y) affine Montgomery limb arrays, each (n, 16).
    scalars: (n, 16) PLAIN Fr limb array.
    Returns a Jacobian point (3 x (16,) limbs, Montgomery).

    Jitted at this boundary: the windowed scan is compiled once per
    (n, c) and reused across every commitment of a proof.
    """
    px, py = points
    n = px.shape[0]
    if c is None:
        c = default_window(n)
    buckets = 1 << c
    digs = digit_matrix(scalars, c)          # (windows, n), LSB window first
    pz = jnp.broadcast_to(jnp.asarray(CV.FQ.one_mont), px.shape)
    ident_x, ident_y, ident_z = CV.identity()
    b_ids = jnp.arange(1, buckets, dtype=jnp.int32)

    def window_body(acc, d):
        # Horner: shift accumulator by c bits first (identity-safe)
        acc = jax.lax.fori_loop(0, c, lambda _, a: CV.double(a), acc)

        order = jnp.argsort(d)
        ds = jnp.take(d, order)
        sx = jnp.take(px, order, axis=0)
        sy = jnp.take(py, order, axis=0)
        sz = pz
        scan = jax.lax.associative_scan(_seg_combine, (sx, sy, sz, ds), axis=0)

        pos = jnp.searchsorted(ds, b_ids, side="right") - 1
        present = (jnp.take(ds, jnp.clip(pos, 0)) == b_ids) & (pos >= 0)
        gx = jnp.take(scan[0], jnp.clip(pos, 0), axis=0)
        gy = jnp.take(scan[1], jnp.clip(pos, 0), axis=0)
        gz = jnp.take(scan[2], jnp.clip(pos, 0), axis=0)
        bx = F.select(present, gx, jnp.broadcast_to(ident_x, gx.shape))
        by = F.select(present, gy, jnp.broadcast_to(ident_y, gy.shape))
        bz = F.select(present, gz, jnp.broadcast_to(ident_z, gz.shape))

        # suffix sums T_b = sum_{j >= b} B_j; window sum = sum_b T_b
        suf = jax.lax.associative_scan(
            lambda u, v: CV.add(u, v), (bx, by, bz), axis=0, reverse=True
        )
        s_w = _tree_add(suf)
        return CV.add(acc, s_w), None

    acc, _ = jax.lax.scan(window_body, (ident_x, ident_y, ident_z), digs[::-1])
    return acc


def msm_host(points, scalars) -> tuple | None:
    """Host oracle: python-int Pippenger-free reference (for tests)."""
    acc = None
    for p, s in zip(points, scalars):
        acc = CV.py_add(acc, CV.py_mul(p, int(s)))
    return acc
