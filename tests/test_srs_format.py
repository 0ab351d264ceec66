"""halo2 ParamsKZG `.srs` wire format round trip (backend/srs_format.py).

The reference loads its SRS from `ptau/kzg_bn254_{k}.srs` in this format
(reference src/main.rs:69-75); byte-level parity vs a Rust artifact is
pending a Rust toolchain, but the format self-round-trips and every
parsed point is validated on-curve."""

import hashlib

import numpy as np

from halo2_aes_tpu.backend import srs as SRS
from halo2_aes_tpu.backend import srs_format as SF
from halo2_aes_tpu.ops import curve as CV
from halo2_aes_tpu.ops import field as F


def test_srs_file_roundtrip(tmp_path):
    seed = b"fmt-test"
    k = 5
    srs = SRS.setup(k, seed=seed, cache_dir=None)
    tau = int.from_bytes(
        hashlib.blake2b(seed, digest_size=64).digest(), "little"
    ) % F.FR.modulus
    path = str(tmp_path / f"kzg_bn254_{k}.srs")
    SF.write_srs(path, srs, tau=tau)

    # structural size: 4 + 2*n*64 + 2*128
    import os

    n = 1 << k
    assert os.path.getsize(path) == 4 + 2 * n * 64 + 256

    back = SF.read_srs(path)
    assert back.k == k
    np.testing.assert_array_equal(np.asarray(back.g1_x), np.asarray(srs.g1_x))
    np.testing.assert_array_equal(np.asarray(back.g1_y), np.asarray(srs.g1_y))
    assert back.g2 == srs.g2 and back.s_g2 == srs.s_g2

    # every g power is on curve and g[1] = tau * G
    pts = CV.to_affine_host(
        (back.g1_x, back.g1_y,
         np.tile(np.asarray(F.FQ.one_mont), (n, 1))))
    assert all(CV.py_is_on_curve(p) for p in pts)
    assert pts[0] == (CV.G1_X, CV.G1_Y)
    assert pts[1] == CV.py_mul((CV.G1_X, CV.G1_Y), tau)

    # the lagrange table is internally consistent: sum_i L_i(tau) G = G
    # (sum of all lagrange polys is 1); check via re-parse of the block
    with open(path, "rb") as f:
        buf = f.read()
    off = 4 + n * 64
    lag = np.frombuffer(buf[off : off + n * 64], dtype="<u2")
    lag = lag.reshape(n, 2, F.LIMBS).astype(np.uint32)
    lpts = CV.to_affine_host(
        (lag[:, 0], lag[:, 1], np.tile(np.asarray(F.FQ.one_mont), (n, 1))))
    acc = None
    for p in lpts:
        assert CV.py_is_on_curve(p)
        acc = CV.py_add(acc, p)
    assert acc == (CV.G1_X, CV.G1_Y)
