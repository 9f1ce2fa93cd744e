"""make_split_concat: the ELAN concat-elimination rewrite is exact.

The rewrite replaces conv1x1(concat(xs)) with per-tap sliced matmuls
(models/fastconcat.py); these tests pin that it (a) changes no param
schema, (b) matches the unrewritten plan's outputs, BN state updates and
gradients in fp32, (c) only fires on the eligible pattern (reference
pattern: common.py:56 Concat -> common.py:99 Conv k=1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_series_tpu.models.model import Model, apply_model, init_model
from yolo_series_tpu.models.fastconcat import SplitConcatConv, make_split_concat
from yolo_series_tpu.models import layers as L


def _tree_allclose(a, b, atol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for xa, xb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=atol, rtol=atol)


@pytest.mark.parametrize("cfg,size", [
    ("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml", 64),
    ("yolo_series_tpu/models/cfg/training/yolov7-w6.yaml", 128),
])
def test_split_concat_exact(cfg, size):
    m = Model.from_yaml(cfg)
    plan2 = make_split_concat(m.plan)
    n_rewritten = sum(isinstance(s.block, SplitConcatConv)
                      for s in plan2.layers)
    assert n_rewritten > 0, "no concat was rewritten"
    # param/state schema untouched: same init works for both plans
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, size, size, 3)), jnp.float32)

    def fwd(plan, params, state, training):
        out, ns = apply_model(plan, params, state, x, training=training)
        return out, ns

    # inference
    o1, _ = fwd(m.plan, m.params, m.state, False)
    o2, _ = fwd(plan2, m.params, m.state, False)
    np.testing.assert_allclose(np.asarray(o1["pred"]), np.asarray(o2["pred"]),
                               atol=1e-4, rtol=1e-4)

    # training: loss + BN state updates agree; full-model grads are only
    # required to sit at the network's own rounding-noise floor (train-mode
    # BN at depth amplifies fp32 reduction-order noise to ~1e-2 rel L2 —
    # same methodology as the ReOrg fold, PARITY.md "P6 pathology": the
    # identity is proven exact per-block by test_split_concat_multi_consumer)
    def loss(params, plan, xin):
        out, ns = apply_model(plan, params, m.state, xin, training=True)
        return sum(jnp.mean(jnp.square(r)) for r in out["raw"]), ns

    (l1, ns1), g1 = jax.value_and_grad(loss, has_aux=True)(m.params, m.plan, x)
    (l2, ns2), g2 = jax.value_and_grad(loss, has_aux=True)(m.params, plan2, x)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5, rtol=1e-5)
    _tree_allclose(ns1, ns2, 1e-4)

    def rel_l2(ta, tb):
        fa = jnp.concatenate([jnp.ravel(v) for v in jax.tree_util.tree_leaves(ta)])
        fb = jnp.concatenate([jnp.ravel(v) for v in jax.tree_util.tree_leaves(tb)])
        return float(jnp.linalg.norm(fa - fb) / (jnp.linalg.norm(fa) + 1e-12))

    d_rewrite = rel_l2(g1, g2)
    # noise-floor control: the UNREWRITTEN plan's grad self-divergence under
    # a 1e-6 relative input perturbation
    (_, _), g1p = jax.value_and_grad(loss, has_aux=True)(
        m.params, m.plan, x * (1.0 + 1e-6))
    d_floor = rel_l2(g1, g1p)
    assert d_rewrite < max(3.0 * d_floor, 1e-3), (d_rewrite, d_floor)


def test_split_concat_skips_ineligible():
    # concat feeding a 3x3 conv must NOT be rewritten
    cfg = {
        "nc": 2,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "conv", [8, 3, 2]],
            [-1, 1, "conv", [8, 3, 1]],
            [[-1, -2], 1, "concat", [1]],
            [-1, 1, "conv", [16, 3, 1]],
        ],
        "head": [[[-1], 1, "idetect", ["nc", "anchors"]]],
    }
    m = Model.from_yaml(cfg)
    assert make_split_concat(m.plan) is m.plan


def test_split_concat_multi_consumer():
    # two 1x1 consumers of one concat (the FPN merge pattern) both rewrite
    cfg = {
        "nc": 2,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "conv", [8, 3, 2]],
            [-1, 1, "conv", [8, 3, 1]],
            [[-1, -2], 1, "concat", [1]],
            [-1, 1, "conv", [16, 1, 1]],
            [-2, 1, "conv", [8, 1, 1]],
            [[-1, -2], 1, "concat", [1]],
            [-1, 1, "conv", [16, 1, 1]],
        ],
        "head": [[[-1], 1, "idetect", ["nc", "anchors"]]],
    }
    m = Model.from_yaml(cfg)
    plan2 = make_split_concat(m.plan)
    assert sum(isinstance(s.block, SplitConcatConv) for s in plan2.layers) == 3
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 32, 32, 3)),
                    jnp.float32)
    o1, _ = apply_model(m.plan, m.params, m.state, x)
    o2, _ = apply_model(plan2, m.params, m.state, x)
    np.testing.assert_allclose(np.asarray(o1["pred"]), np.asarray(o2["pred"]),
                               atol=1e-5, rtol=1e-5)

    # shallow model: training-mode gradients are exact to fp32 rounding
    def loss(params, plan):
        out, _ = apply_model(plan, params, m.state, x, training=True)
        return sum(jnp.mean(jnp.square(r)) for r in out["raw"])

    g1 = jax.grad(loss)(m.params, m.plan)
    g2 = jax.grad(loss)(m.params, plan2)
    _tree_allclose(g1, g2, 1e-5)
