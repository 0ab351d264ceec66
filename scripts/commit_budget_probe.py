"""Time srs.commit (the real table-backed MSM) under a given window-group
budget: HALO2_TPU_MSM_GROUP_BUDGET rows per lax.map group.

Usage: HALO2_TPU_MSM_GROUP_BUDGET=N python scripts/commit_budget_probe.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from halo2_aes_tpu.ops import field

field.set_compact_graphs(True)

import jax

from halo2_aes_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
if jax.default_backend() != "cpu":
    from halo2_aes_tpu.ops import pallas_field

    pallas_field.enable_in_field_ops()

import jax.numpy as jnp
import numpy as np

from halo2_aes_tpu.backend import srs as SRS
from halo2_aes_tpu.ops import field as F

K = int(os.environ.get("PROBE_K", "17"))
N = 1 << K


def main():
    budget = os.environ.get("HALO2_TPU_MSM_GROUP_BUDGET", "default")
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, (N, F.LIMBS), dtype=np.uint32)
    limbs[:, 15] &= 0x1FFF
    a = jnp.asarray(limbs)
    srs = SRS.setup(K)
    srs.warm_tables()

    t0 = time.perf_counter()
    out = srs.commit(a)
    np.asarray(out[0])
    print(f"budget={budget} compile+run {time.perf_counter()-t0:.2f}s",
          flush=True)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = srs.commit(a)
        np.asarray(out[0])
    print(f"budget={budget} steady {(time.perf_counter()-t0)/reps*1e3:.1f} ms",
          flush=True)

    # batched: 8 commits dispatched before any read (the prover pattern)
    t0 = time.perf_counter()
    outs = [srs.commit(a) for _ in range(8)]
    for o in outs:
        np.asarray(o[0])
    print(f"budget={budget} 8 async commits {time.perf_counter()-t0:.2f}s",
          flush=True)

    # msm_many: 8 commitments in ONE executable
    from halo2_aes_tpu.ops import msm as M

    c = M.default_window(srs.n)
    scal8 = F.from_mont(F.FR, jnp.tile(a, (8, 1)))
    stack = M.msm_many((srs.g1_x, srs.g1_y), scal8, 8, c, srs._msm_tables)
    np.asarray(stack[0][0])
    t0 = time.perf_counter()
    stack = M.msm_many((srs.g1_x, srs.g1_y), scal8, 8, c, srs._msm_tables)
    np.asarray(stack[0][0])
    print(f"budget={budget} msm_many x8 {time.perf_counter()-t0:.2f}s",
          flush=True)


if __name__ == "__main__":
    main()
