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


def test_chip_rate_slope():
    """chip_rate (utils/chiprate.py): the carry-chained fori_loop slope
    returns a positive steady-state time and counts every iteration (the
    dependency chain must not be CSE'd away)."""
    import jax.numpy as jnp

    from yolo_series_tpu.utils.chiprate import chip_rate

    calls = {"n": 0}

    def fn(x):
        # (count trace-time only; execution count is what the carry chain
        # guarantees — asserted indirectly by a sane positive slope)
        calls["n"] += 1
        return (jnp.sum(x.astype(jnp.int32), axis=(1, 2, 3)) % 7,)

    x = jnp.ones((2, 16, 16, 3), jnp.uint8)
    per = chip_rate(fn, x, iters=4, reps=1)
    # on CPU a micro-op's slope is noise-dominated; assert it's a sane
    # small magnitude (the N vs 2N runs actually executed), not its sign
    assert abs(per) < 0.5
    assert calls["n"] == 1  # traced once inside the jitted loop
