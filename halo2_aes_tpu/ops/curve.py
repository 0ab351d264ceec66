"""BN254 G1 arithmetic: batched Jacobian point ops on Fq limb vectors.

Role of `halo2curves` bn256 G1 in the reference dependency tree
(reference Cargo.lock:779-781): the group the KZG commitment MSMs live
in.  TPU-first design: points are structure-of-arrays limb tensors
(X, Y, Z each ``(..., 16)`` uint32, Montgomery form), and every group
operation is branch-free — identity/equal/negative special cases are
resolved with ``where`` selects so the combiner is usable inside
``associative_scan`` / ``fori_loop`` (the MSM building blocks).

Curve: y^2 = x^3 + 3 over Fq, prime order r (= Fr modulus).  Identity
convention: Z == 0 (X, Y ignored).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from halo2_aes_tpu.ops import field as F

FQ = F.FQ
B_COEFF = 3

# generator (FIPS-agnostic curve constant; halo2curves bn256 G1 generator)
G1_X = 1
G1_Y = 2


def identity(shape=()):
    z = F.zeros(shape)
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont), (*shape, F.LIMBS))
    return (one, one, z)


def is_identity(p):
    return F.is_zero(p[2])


def affine_to_jacobian(xy):
    """(x, y) Montgomery limb arrays -> Jacobian with Z = 1."""
    x, y = xy
    z = jnp.broadcast_to(jnp.asarray(FQ.one_mont), x.shape)
    return (x, y, z)


def neg(p):
    x, y, z = p
    return (x, F.neg(FQ, y), z)


def _bmul(pairs):
    """One stacked Montgomery multiply for independent products.

    pairs: list of (a, b) limb arrays with a common batch shape.  Batching
    keeps the traced graph small (one mul op instead of len(pairs)) and
    the device lanes wide."""
    a = jnp.stack([x for x, _ in pairs])
    b = jnp.stack([y for _, y in pairs])
    out = F.mont_mul(FQ, a, b)
    return [out[i] for i in range(len(pairs))]


def double(p):
    """Jacobian doubling, a = 0 (dbl-2009-l).  Identity-safe: Z=0 -> Z3=0.

    4 stacked multiply stages."""
    X, Y, Z = p
    A, B, YZ = _bmul([(X, X), (Y, Y), (Y, Z)])
    XB = F.add(FQ, X, B)
    C, t = _bmul([(B, B), (XB, XB)])
    tac = F.sub(FQ, F.sub(FQ, t, A), C)
    D = F.add(FQ, tac, tac)
    E = F.add(FQ, F.add(FQ, A, A), A)
    (Fv,) = _bmul([(E, E)])
    X3 = F.sub(FQ, Fv, F.add(FQ, D, D))
    C4 = F.add(FQ, F.add(FQ, C, C), F.add(FQ, C, C))
    C8 = F.add(FQ, C4, C4)
    (EDX,) = _bmul([(E, F.sub(FQ, D, X3))])
    Y3 = F.sub(FQ, EDX, C8)
    Z3 = F.add(FQ, YZ, YZ)
    return (X3, Y3, Z3)


def add(p, q):
    """Complete Jacobian addition via select: handles identity on either
    side, P + P (falls through to double), and P + (-P) (identity).

    Cost: one general add (6 stacked multiply stages) + one double per
    call — the price of a branch-free combiner that
    associative_scan/fori_loop can use.  Large batches route to the
    fused Pallas kernel when enabled (ops/pallas_curve.py).
    """
    from halo2_aes_tpu.ops import pallas_curve

    fused = pallas_curve.maybe_add(p, q)
    if fused is not None:
        return fused
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1, Z2Z2, Y1Z2, Y2Z1, Z1Z2 = _bmul(
        [(Z1, Z1), (Z2, Z2), (Y1, Z2), (Y2, Z1), (Z1, Z2)]
    )
    U1, U2, S1, S2 = _bmul(
        [(X1, Z2Z2), (X2, Z1Z1), (Y1Z2, Z2Z2), (Y2Z1, Z1Z1)]
    )
    H = F.sub(FQ, U2, U1)
    R = F.sub(FQ, S2, S1)
    HH, RR, Z3 = _bmul([(H, H), (R, R), (Z1Z2, H)])
    HHH, V = _bmul([(HH, H), (U1, HH)])
    X3 = F.sub(FQ, F.sub(FQ, RR, HHH), F.add(FQ, V, V))
    RVX, SH = _bmul([(R, F.sub(FQ, V, X3)), (S1, HHH)])
    Y3 = F.sub(FQ, RVX, SH)

    p1_inf = is_identity(p)
    p2_inf = is_identity(q)
    same_x = F.is_zero(H) & ~p1_inf & ~p2_inf
    same_y = F.is_zero(R)
    dbl = double(p)

    def sel(c, a, b):
        return F.select(c, a, b)

    out = []
    zero = jnp.zeros_like(Z3)
    for i, (g, d, a1, a2) in enumerate(zip((X3, Y3, Z3), dbl, p, q)):
        v = sel(same_x & same_y, d, g)            # P + P -> double
        if i == 2:
            v = sel(same_x & ~same_y, zero, v)    # P + (-P) -> identity
        v = sel(p2_inf, a1, v)
        v = sel(p1_inf, a2, v)
        out.append(v)
    return tuple(out)


def to_affine_host(p) -> list:
    """Batched Jacobian (device/host limbs) -> list of (x, y) python ints
    (plain form), identity -> None.  Host-side; for tests and transcripts."""
    X, Y, Z = (np.asarray(c) for c in p)
    X = X.reshape(-1, F.LIMBS)
    Y = Y.reshape(-1, F.LIMBS)
    Z = Z.reshape(-1, F.LIMBS)
    out = []
    q = FQ.modulus
    for i in range(X.shape[0]):
        z = FQ.from_mont_host(F.limbs_to_int(Z[i]))
        if z == 0:
            out.append(None)
            continue
        x = FQ.from_mont_host(F.limbs_to_int(X[i]))
        y = FQ.from_mont_host(F.limbs_to_int(Y[i]))
        zinv = pow(z, -1, q)
        out.append((x * zinv * zinv % q, y * zinv * zinv % q * zinv % q))
    return out


def affine_from_ints(points) -> tuple:
    """List of (x, y) python ints (plain) -> batched affine limb arrays
    (Montgomery).  Identity entries are not representable here; filter
    them before encoding."""
    xs = FQ.encode([x for x, _ in points])
    ys = FQ.encode([y for _, y in points])
    return jnp.asarray(xs), jnp.asarray(ys)


# ---------------------------------------------------------------------------
# host oracle (python bigints) — for tests and host-side setup
# ---------------------------------------------------------------------------

def py_add(p, q, mod=FQ.modulus):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % mod == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, mod) % mod
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, mod) % mod
    x3 = (lam * lam - x1 - x2) % mod
    y3 = (lam * (x1 - x3) - y1) % mod
    return (x3, y3)


def py_mul(p, k: int):
    acc = None
    while k:
        if k & 1:
            acc = py_add(acc, p)
        p = py_add(p, p)
        k >>= 1
    return acc


def py_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    q = FQ.modulus
    return (y * y - x * x * x - B_COEFF) % q == 0
