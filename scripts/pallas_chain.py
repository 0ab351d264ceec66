import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, numpy as np, jax.numpy as jnp
from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops import pallas_field as PF
import random
rng = random.Random(9)
n = 1 << 17
av = [rng.randrange(F.FR.modulus) for _ in range(1024)]
a = jnp.asarray(np.tile(F.ints_to_limbs_fast(av), (n // 1024, 1)))
PF.set_enabled(True)
REP = 50
@jax.jit
def chain_pallas(x):
    for _ in range(REP):
        x = PF.mont_mul(F.FR, x, x)
    return x[0]
@jax.jit
def chain_xla(x):
    for _ in range(REP):
        x = F.mont_mul(F.FR, x, x)
    return x[0]
for name, fn in [("pallas", chain_pallas), ("xla-compact", chain_xla)]:
    _ = np.asarray(fn(a))
    t0 = time.time(); _ = np.asarray(fn(a)); dt = time.time() - t0
    print(f"{name}: {dt/REP*1000:.2f} ms per 2^17 mul", flush=True)
