"""Shape/compile tests for every shipped model cfg (SURVEY.md §4b).

Uses jax.eval_shape so the whole zoo is validated without any FLOPs —
the reference only catches graph bugs at runtime.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_series_tpu.models.graph import compile_graph
from yolo_series_tpu.models.model import apply_model, init_model

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "yolo_series_tpu", "models", "cfg")
ALL_CFGS = sorted(glob.glob(os.path.join(CFG_DIR, "*", "*.yaml")))

assert ALL_CFGS, "no cfgs found"


@pytest.mark.parametrize("cfg", ALL_CFGS, ids=lambda p: "/".join(p.split(os.sep)[-2:]))
def test_compile_init_forward_shapes(cfg):
    plan = compile_graph(cfg)
    is_p6 = len(plan.strides) == 4
    assert tuple(plan.strides) == ((8.0, 16.0, 32.0, 64.0) if is_p6 else (8.0, 16.0, 32.0))

    img = 128
    params, state = jax.eval_shape(lambda k: init_model(plan, k), jax.random.PRNGKey(0))

    def fwd(p, s, x):
        return apply_model(plan, p, s, x, training=True)

    x = jax.ShapeDtypeStruct((1, img, img, 3), jnp.float32)
    out, _ = jax.eval_shape(fwd, params, state, x)
    head = plan.head
    na, no = head.na, head.nc + 5
    n_lead = len(head.strides)
    assert len(out["raw"]) in (n_lead, 2 * n_lead)
    for i, s in enumerate(head.strides):
        g = int(img // s)
        assert out["raw"][i].shape == (1, na, g, g, no), cfg

    def fwd_inf(p, s, x):
        return apply_model(plan, p, s, x, training=False)

    out, _ = jax.eval_shape(fwd_inf, params, state, x)
    total = sum(na * int(img // s) ** 2 for s in head.strides)
    assert out["pred"].shape == (1, total, no)


def test_grad_flows_tiny():
    """1 fwd/bwd on a 64px tiny model: catches non-differentiable plumbing."""
    plan = compile_graph(os.path.join(CFG_DIR, "training", "yolov7-tiny.yaml"))
    params, state = init_model(plan, jax.random.PRNGKey(0))

    def loss_fn(p):
        out, _ = apply_model(plan, p, state, jnp.ones((1, 64, 64, 3)), training=True)
        return sum(jnp.mean(jnp.square(r)) for r in out["raw"])

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # some gradient must be nonzero
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_dsl_long_tail_blocks():
    """Long-tail blocks compile and run through the YAML DSL end to end."""
    cfg = {
        "nc": 4, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "ghoststem", [32]],
            [-1, 1, "robustconv", [32, 7, 1]],
            [-1, 1, "crossconv", [32, 3, 1]],
            [-1, 1, "mixconv2d", [32]],
            [-1, 1, "stcspa", [64]],
            [-1, 1, "transformerblock", [64, 4, 1]],
            [[-1, -2], 1, "sum", [2]],
        ],
        "head": [
            [-1, 1, "ghostsppcspc", [64]],
            [-1, 1, "repconv_orepa", [64, 3, 1]],
            [[-1], 1, "idetect", ["nc", "anchors"]],
        ],
    }
    plan = compile_graph(cfg)
    params, state = init_model(plan, jax.random.PRNGKey(0))
    out, _ = apply_model(plan, params, state,
                         jnp.ones((1, 64, 64, 3)), training=False)
    assert out["pred"].shape[-1] == 9  # nc 4 + 5
    assert np.all(np.isfinite(np.asarray(out["pred"])))
