"""Per-layer forward profiler (reference Model.forward_once(profile=True),
yolo.py:614-623)."""

import numpy as np


def test_profile_layers_rows():
    from yolo_series_tpu.models.model import Model

    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    rows = m.profile(x, iters=1)
    assert len(rows) == len(m.plan.layers)  # every layer incl. the head
    assert all(r["ms"] > 0 for r in rows)
    assert rows[-1]["module"] == "IDetect"
    # per-layer params sum to the model total (reference prints both)
    assert sum(r["params"] for r in rows) == m.num_params()
