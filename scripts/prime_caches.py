"""One-command cache priming for serving deployments.

Cold-start economics (BASELINE.md): the first-ever prove on a fresh host
is compile-bound (SRS generation + keygen + XLA/Mosaic compiles, tens of
minutes).  A serving deployment must pay that ONCE, explicitly, before
taking traffic — not implicitly inside whichever request arrives first.

This script warms every disk cache the prover uses, in order:
  1. ptau/kzg_bn254_{k}_*.npz          — SRS powers (backend/srs.py)
  2. ptau/msm_tables_{k}_*.npz         — per-window shifted MSM tables
  3. ptau/pk_*_s{k}_*.npz              — proving-key commitments+assembly
  4. ptau/xla_cache/                   — persistent XLA executable cache
  5. ptau/bench_config.json            — records the proven config so
     bench.py / serving pick it up (only hardware-verified configs land)

Usage:
    python scripts/prime_caches.py [k] [blocks] [sets] [--tagged]

Defaults to the k=17 full-capacity single-set config (96 blocks).  After
one successful run, steady-state proves need no compile and keygen loads
from disk in seconds.  Equivalent to:
    python scripts/prove_steady.py K BLOCKS SETS --record-bench-config
(the reference's analog is the `ptau/` SRS cache in src/main.rs:70-75,
which covers only the SRS — this also covers pk, MSM tables, and
compiled executables).
"""

import pathlib
import runpy
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tagged = "--tagged" in sys.argv[1:]
    k = args[0] if len(args) > 0 else "17"
    blocks = args[1] if len(args) > 1 else "96"
    sets = args[2] if len(args) > 2 else "1"
    sys.argv = ["prove_steady.py", k, blocks, sets, "--record-bench-config"]
    if tagged:
        sys.argv.append("--tagged")
    runpy.run_path(
        str(pathlib.Path(__file__).resolve().parent / "prove_steady.py"),
        run_name="__main__")
