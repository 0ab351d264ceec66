import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, numpy as np, jax.numpy as jnp
from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops import pallas_field as PF
import random
rng = random.Random(9)
n = 1 << 13
av = [rng.randrange(F.FR.modulus) for _ in range(n)]
bv = [rng.randrange(F.FR.modulus) for _ in range(n)]
a = jnp.asarray(F.ints_to_limbs_fast(av))  # treat as Montgomery reps directly
b = jnp.asarray(F.ints_to_limbs_fast(bv))
PF.set_enabled(True)
t0 = time.time(); out_p = np.asarray(PF.mont_mul(F.FR, a, b)); t1 = time.time()
out_x = np.asarray(F.mont_mul(F.FR, a, b)); _ = out_x
print(f"pallas compile+run {t1-t0:.1f}s; match: {bool((out_p == out_x).all())}", flush=True)
# timing at 2^17
n2 = 1 << 17
a2 = jnp.tile(a, (n2 // n, 1)); b2 = jnp.tile(b, (n2 // n, 1))
_ = np.asarray(PF.mont_mul(F.FR, a2, b2))
t0 = time.time(); _ = np.asarray(PF.mont_mul(F.FR, a2, b2)); t1 = time.time()
print(f"pallas 2^17 mul steady: {t1-t0:.3f}s", flush=True)
_ = np.asarray(F.mont_mul(F.FR, a2, b2))
t0 = time.time(); _ = np.asarray(F.mont_mul(F.FR, a2, b2)); t1 = time.time()
print(f"xla    2^17 mul steady: {t1-t0:.3f}s", flush=True)
