import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from halo2_aes_tpu.ops import field as F
F.set_compact_graphs(True)
from halo2_aes_tpu.ops import pallas_field as PF
PF.enable_in_field_ops()
import jax, numpy as np, jax.numpy as jnp
from halo2_aes_tpu.ops.ntt import domain, ntt
print("backend:", jax.default_backend(), flush=True)
dom = domain(F.FR, 17)
x = jnp.asarray(F.FR.encode(list(range(1 << 17))))
t0 = time.time(); y = ntt(dom, x); _ = np.asarray(y[0]); print(f"ntt 2^17 pallas compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); y = ntt(dom, x); _ = np.asarray(y[0]); print(f"ntt 2^17 pallas steady {time.time()-t0:.2f}s", flush=True)
back = ntt(dom, y, inverse=True)
ok = bool(np.array_equal(np.asarray(ntt(dom, x, inverse=True)), np.asarray(ntt(dom, x, inverse=True))))
print("ntt roundtrip check:", bool(np.array_equal(np.asarray(back)[:16], np.asarray(x)[:16]))or 'MISMATCH', flush=True)
# MSM with pallas
from halo2_aes_tpu.ops import curve as CV, msm as M
import random
rng = random.Random(1)
G = (CV.G1_X, CV.G1_Y)
base = CV.affine_from_ints([CV.py_mul(G, i + 1) for i in range(64)])
n = 1 << 17
px = jnp.tile(base[0], (n // 64, 1)); py = jnp.tile(base[1], (n // 64, 1))
limbs = np.random.default_rng(0).integers(0, 1 << 16, size=(n, 16), dtype=np.uint32); limbs[:, 15] &= 0x1fff
t0 = time.time(); out = M.msm((px, py), jnp.asarray(limbs)); _ = np.asarray(out[0]); print(f"msm 2^17 pallas compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); out = M.msm((px, py), jnp.asarray(limbs)); _ = np.asarray(out[0]); print(f"msm 2^17 pallas steady {time.time()-t0:.2f}s", flush=True)
