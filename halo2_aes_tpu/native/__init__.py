"""Native (C++) host backend loader: BN254 G1 ops + optimal-ate pairing.

Role of halo2curves' CPU curve/pairing layer for the VERIFIER
(native/bn254_host.cpp).  The shared object is compiled on first use
with the system g++ and cached by source hash; every numeric constant
(modulus, Montgomery parameters, exponent bit strings) is computed here
with Python bigints and injected via ``bn254_init``, so the C++ holds
no transcribed magic numbers.  If the toolchain or the self-test is
unavailable, ``available()`` is False and callers silently keep the
pure-Python path (backend/pairing.py, ops/curve.py py_*).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "bn254_host.cpp")


def _limbs(x: int):
    return (ctypes.c_uint64 * 4)(*[(x >> (64 * i)) & ((1 << 64) - 1)
                                   for i in range(4)])


def _bits_msb(x: int):
    s = bin(x)[2:]
    return (ctypes.c_uint8 * len(s))(*[int(c) for c in s]), len(s)


@functools.lru_cache(maxsize=1)
def _lib():
    """Compile (cached) + load + init; returns the ctypes lib or None."""
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.blake2b(src, digest_size=12).hexdigest()
        so = os.path.join(tempfile.gettempdir(), f"bn254_host_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=300)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
    except Exception:
        return None

    from halo2_aes_tpu.ops.field import FQ, FR

    q, r = FQ.modulus, FR.modulus
    u = 4965661367192848881
    q_bits, q_len = _bits_msb(q)
    hard_bits, hard_len = _bits_msb((q**4 - q**2 + 1) // r)
    ate_bits, ate_len = _bits_msb(6 * u + 2)
    r2 = pow(2, 512, q)
    n0inv = (-pow(q, -1, 1 << 64)) % (1 << 64)
    lib.bn254_init(_limbs(q), ctypes.c_uint64(n0inv), _limbs(r2),
                   q_bits, q_len, hard_bits, hard_len, ate_bits, ate_len)
    lib.g1_msm.restype = ctypes.c_int
    lib.pairing_product_is_one.restype = ctypes.c_int

    # self-test: e(P, Q) * e(-P, Q) == 1 and 2P via msm matches Python
    try:
        from halo2_aes_tpu.backend import pairing as PR
        from halo2_aes_tpu.ops import curve as CV

        g1 = (CV.G1_X, CV.G1_Y)
        if _g1_msm(lib, [g1, g1], [1, 1]) != CV.py_add(g1, g1):
            return None
        neg = (g1[0], (-g1[1]) % q)
        if not _pairing_product(lib, [(g1, PR.G2), (neg, PR.G2)]):
            return None
        if _pairing_product(lib, [(g1, PR.G2), (g1, PR.G2)]):
            return None
    except Exception:
        return None
    return lib


def available() -> bool:
    return _lib() is not None


def g1_msm(points, scalars):
    """sum_i scalars[i] * points[i]; points: affine int pairs or None;
    returns an affine int pair or None (infinity)."""
    return _g1_msm(_lib(), points, scalars)


def _g1_msm(lib, points, scalars):
    n = len(points)
    xs = (ctypes.c_uint64 * (4 * n))()
    ys = (ctypes.c_uint64 * (4 * n))()
    inf = (ctypes.c_uint8 * n)()
    sc = (ctypes.c_uint64 * (4 * n))()
    for i, (pt, s) in enumerate(zip(points, scalars)):
        if pt is None or s == 0:
            inf[i] = 1
            continue
        for j in range(4):
            xs[4 * i + j] = (pt[0] >> (64 * j)) & ((1 << 64) - 1)
            ys[4 * i + j] = (pt[1] >> (64 * j)) & ((1 << 64) - 1)
            sc[4 * i + j] = (int(s) >> (64 * j)) & ((1 << 64) - 1)
    out = (ctypes.c_uint64 * 8)()
    if lib.g1_msm(xs, ys, inf, sc, n, out):
        return None
    x = sum(int(out[j]) << (64 * j) for j in range(4))
    y = sum(int(out[j + 4]) << (64 * j) for j in range(4))
    return (x, y)


def _pairing_product(lib, pairs) -> bool:
    n = len(pairs)
    g1 = (ctypes.c_uint64 * (8 * n))()
    g1_inf = (ctypes.c_uint8 * n)()
    g2 = (ctypes.c_uint64 * (16 * n))()
    g2_inf = (ctypes.c_uint8 * n)()
    for i, (p, q2) in enumerate(pairs):
        if p is None:
            g1_inf[i] = 1
        else:
            for j in range(4):
                g1[8 * i + j] = (p[0] >> (64 * j)) & ((1 << 64) - 1)
                g1[8 * i + 4 + j] = (p[1] >> (64 * j)) & ((1 << 64) - 1)
        if q2 is None:
            g2_inf[i] = 1
        else:
            (x0, x1), (y0, y1) = q2
            for j, v in enumerate((x0, x1, y0, y1)):
                for l in range(4):
                    g2[16 * i + 4 * j + l] = (v >> (64 * l)) & ((1 << 64) - 1)
    return bool(lib.pairing_product_is_one(g1, g1_inf, g2, g2_inf, n))


def pairing_product_is_one(pairs) -> bool:
    return _pairing_product(_lib(), pairs)
