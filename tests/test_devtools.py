"""Cost estimator + layout renderer (reference dev-graph/cost-estimator
feature parity, reference src/aes128.rs:437-477)."""

import json
import os

from halo2_aes_tpu.models.aes128 import AesConfig, compile_circuit
from halo2_aes_tpu.utils import cost_model, layout_viz


def test_cost_model_aes(tmp_path):
    # 100 blocks spill into set 1 (set-0 capacity is 96 at k=17), so both
    # sets' lookups are live — except set 1's u8 range lookup, which only
    # the key schedule (set 0) uses and compile-time pruning drops
    layout = compile_circuit(AesConfig(k=17, n_sets=2, n_blocks=100))
    cm = cost_model.estimate(layout)
    assert cm.k == 17 and cm.ext_k == 19
    assert cm.lookups == 9           # 5 (set 0) + 4 (set 1, range pruned)
    assert cm.gates == 1             # Equality RC
    assert cm.advice_columns == 7    # 3 per set + words
    assert cm.max_degree == 5
    assert cm.proof_bytes == 32 * (cm.proof_points + cm.proof_scalars)
    json.loads(cm.json())


def test_layout_render(tmp_path):
    layout = compile_circuit(AesConfig(k=17, n_sets=1, n_blocks=2))
    path = os.path.join(tmp_path, "layout.png")
    layout_viz.render(layout, path, max_rows=256)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(path) > 100


def test_cost_model_dec_circuit():
    from halo2_aes_tpu.models.aes128_dec import AesDecConfig
    from halo2_aes_tpu.models.aes128_dec import compile_circuit as compile_dec

    layout = compile_dec(AesDecConfig(k=17, n_sets=2, n_blocks=100))
    cm = cost_model.estimate(layout)
    # 3 per live column set (tagged-op design), set 1's range lookup pruned
    assert cm.lookups == 5
    assert cm.proof_bytes == 32 * (cm.proof_points + cm.proof_scalars)


def test_sanitize_canonicity():
    """Limb-canonicity sanitizer (SURVEY.md §5.2): canonical tensors
    pass; >= modulus, limb overflow, and bad shapes are flagged."""
    import numpy as np
    import pytest

    from halo2_aes_tpu.ops import field as F
    from halo2_aes_tpu.utils import sanitize as SAN

    good = np.asarray(F.FR.encode([0, 1, F.FR.modulus - 1]))
    assert SAN.noncanonical_count(F.FR, good) == 0

    bad = np.asarray(good).copy()
    bad[1] = F.int_to_limbs(F.FR.modulus)          # == r: non-canonical
    assert SAN.noncanonical_count(F.FR, bad) == 1
    with pytest.raises(SAN.SanitizeError, match="non-canonical"):
        SAN.check_canonical(F.FR, bad, "t")

    over = np.asarray(good).copy()
    over[0, 3] = 1 << 16                            # limb overflow
    assert SAN.noncanonical_count(F.FR, over) == 1

    with pytest.raises(SAN.SanitizeError, match="expected"):
        SAN.noncanonical_count(F.FR, np.zeros((4, 3), np.uint32))

    # check_phase is a no-op unless HALO2_SANITIZE=1
    SAN.check_phase(F.FR, "p", t=bad)
    os.environ["HALO2_SANITIZE"] = "1"
    try:
        with pytest.raises(SAN.SanitizeError):
            SAN.check_phase(F.FR, "p", t=bad)
        SAN.check_phase(F.FR, "p", t=good, empty=np.zeros((0, 16), np.uint32),
                        none=None)
    finally:
        del os.environ["HALO2_SANITIZE"]
