"""Multi-PROCESS collectives: jax.distributed across OS processes.

The multi-host (DCN) analog of BASELINE config 5 on one box: two
separate Python processes joined into one 8-device mesh via
``jax.distributed`` + Gloo cross-process collectives, running the
distributed four-step NTT (its all-to-all crosses the process
boundary) and the point-sharded collective MSM.  Reference has no
distributed capability at all (SURVEY.md section 2.13 item 5).
"""

import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

SCRIPT = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "multihost_demo.py"


def test_two_process_ntt_msm_collectives():
    r = subprocess.run(
        [sys.executable, str(SCRIPT)],
        timeout=600, capture_output=True, text=True,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "multihost demo ok" in r.stdout
