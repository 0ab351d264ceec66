import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import sys, time, jax, numpy as np
from halo2_aes_tpu.ops import field as F
F.set_compact_graphs(sys.argv[1] == "compact")
from halo2_aes_tpu.ops import curve as CV, msm as M
import jax.numpy as jnp
n = 1 << 17
rng = np.random.default_rng(0)
# fake points: reuse generator powers cheaply (correctness not needed for timing)
G = (CV.G1_X, CV.G1_Y)
base = CV.affine_from_ints([CV.py_mul(G, i + 1) for i in range(64)])
px = jnp.tile(base[0], (n // 64, 1)); py = jnp.tile(base[1], (n // 64, 1))
limbs = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
limbs[:, 15] &= 0x1fff
scal = jnp.asarray(limbs)
t0 = time.time()
out = M.msm((px, py), scal); _ = np.asarray(out[0])  # forced transfer = real sync
print(f"{sys.argv[1]} msm 2^17 compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = M.msm((px, py), scal); _ = np.asarray(out[0])
print(f"{sys.argv[1]} msm 2^17 steady: {time.time()-t0:.1f}s", flush=True)
