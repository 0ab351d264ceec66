"""Cost estimator + layout renderer (reference dev-graph/cost-estimator
feature parity, reference src/aes128.rs:437-477)."""

import json
import os

from halo2_aes_tpu.models.aes128 import AesConfig, compile_circuit
from halo2_aes_tpu.utils import cost_model, layout_viz


def test_cost_model_aes(tmp_path):
    layout = compile_circuit(AesConfig(k=17, n_sets=2, n_blocks=3))
    cm = cost_model.estimate(layout)
    assert cm.k == 17 and cm.ext_k == 19
    assert cm.lookups == 10          # 5 per column set
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
