import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from halo2_aes_tpu.ops import field as F
F.set_compact_graphs(True)
import jax, numpy as np, jax.numpy as jnp
from halo2_aes_tpu.ops import curve as CV, pallas_curve as PC, msm as M
import random
rng = np.random.default_rng(2)
G = (CV.G1_X, CV.G1_Y)
n = 1 << 13
base = [CV.py_mul(G, i + 2) for i in range(32)]
pa = CV.affine_from_ints(base * (n // 32))
qa = CV.affine_from_ints(base[::-1] * (n // 32))
p = CV.affine_to_jacobian(pa); q = CV.affine_to_jacobian(qa)
ref = tuple(np.asarray(c) for c in CV.add(p, q))      # XLA path (flag off)
PC.set_enabled(True)
out = CV.add(p, q)
got = tuple(np.asarray(c) for c in out)
# compare affine (Z differs only if algorithms differ; here same algo -> exact)
match = all((a == b).all() for a, b in zip(ref, got))
print("fused adder exact match:", match, flush=True)
if not match:
    aff_ref = CV.to_affine_host(ref); aff_got = CV.to_affine_host(got)
    print("affine match:", aff_ref[:4] == aff_got[:4], flush=True)
# special cases: P+P, P+(-P), identity
pp = CV.add(p, p)
print("P+P ok:", CV.to_affine_host(tuple(c[:2] for c in pp)) == [CV.py_add(x, x) for x in base[:2]], flush=True)
negq = CV.neg(p)
pn = CV.add(p, negq)
print("P+(-P) identity:", CV.to_affine_host(tuple(c[:2] for c in pn)) == [None, None], flush=True)
# MSM timing with fused adder
from halo2_aes_tpu.ops import pallas_field as PF
PF.enable_in_field_ops()
n2 = 1 << 17
px = jnp.tile(pa[0], (n2 // n, 1)); py = jnp.tile(pa[1], (n2 // n, 1))
limbs = rng.integers(0, 1 << 16, size=(n2, 16), dtype=np.uint32); limbs[:, 15] &= 0x1fff
t0 = time.time(); out = M.msm((px, py), jnp.asarray(limbs)); _ = np.asarray(out[0])
print(f"msm 2^17 fused compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); out = M.msm((px, py), jnp.asarray(limbs)); _ = np.asarray(out[0])
print(f"msm 2^17 fused steady {time.time()-t0:.2f}s", flush=True)
