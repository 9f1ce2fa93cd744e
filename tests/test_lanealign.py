"""make_lane_align: the 128-lane concat-alignment rewrite is exact.

The pass zero-pads ELAN-tap conv outputs to 128-channel multiples and
inserts matching zero kernel rows in consumers (models/lanealign.py), so
every Concat lowers to whole-tile copies on the TPU's (8,128) layout.
These tests pin that it (a) changes no param/state schema, (b) matches
the unrewritten plan bit-exactly in eval and to the fp32 noise floor in
train, (c) aligns every w6 concat, (d) skips ineligible patterns.
(Reference pattern being re-expressed: common.py:56 Concat of
common.py:99 Conv outputs, cfg/training/yolov7-w6.yaml.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.lanealign import LaneAlignedConv, make_lane_align
from yolo_series_tpu.models.model import Model, apply_model


def _tree_allclose(a, b, atol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for xa, xb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=atol, rtol=atol)


def test_lane_align_w6_exact():
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-w6.yaml")
    plan2 = make_lane_align(m.plan)
    n_rw = sum(isinstance(s.block, LaneAlignedConv) for s in plan2.layers)
    assert n_rw > 0, "no conv was rewritten"
    # every concat boundary in the rewritten plan sits on a 128 multiple
    for s in plan2.layers:
        if isinstance(s.block, L.Concat):
            assert all(b % 128 == 0 for b in np.cumsum(s.block.cins)), \
                (s.index, s.block.cins)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 128, 128, 3)), jnp.float32)

    # eval: exact up to fp32 reduction order (zero channels stay zero
    # through BN-eval + SiLU and zero kernel rows ignore them, but the
    # padded contraction changes XLA's reduction tree -> last-ulp noise)
    o1, _ = apply_model(m.plan, m.params, m.state, x)
    o2, _ = apply_model(plan2, m.params, m.state, x)
    np.testing.assert_allclose(np.asarray(o1["pred"]), np.asarray(o2["pred"]),
                               atol=1e-4, rtol=1e-4)

    # train: loss + BN state to the fp32 reduction-order floor (conv
    # shapes change, so XLA re-orders reductions; same methodology as
    # test_fastconcat)
    def loss(params, plan):
        out, ns = apply_model(plan, params, m.state, x, training=True)
        return sum(jnp.mean(jnp.square(r)) for r in out["raw"]), ns

    (l1, ns1), g1 = jax.value_and_grad(loss, has_aux=True)(m.params, m.plan)
    (l2, ns2), g2 = jax.value_and_grad(loss, has_aux=True)(m.params, plan2)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5, rtol=1e-5)
    _tree_allclose(ns1, ns2, 1e-3)

    def rel_l2(ta, tb):
        fa = jnp.concatenate([jnp.ravel(v)
                              for v in jax.tree_util.tree_leaves(ta)])
        fb = jnp.concatenate([jnp.ravel(v)
                              for v in jax.tree_util.tree_leaves(tb)])
        return float(jnp.linalg.norm(fa - fb)
                     / (jnp.linalg.norm(fa) + 1e-12))

    d_rewrite = rel_l2(g1, g2)

    # noise-floor control: unrewritten plan under 1e-6 input perturbation
    def loss_x(params, plan, xin):
        out, ns = apply_model(plan, params, m.state, xin, training=True)
        return sum(jnp.mean(jnp.square(r)) for r in out["raw"]), ns

    (_, _), g1r = jax.value_and_grad(loss_x, has_aux=True)(
        m.params, m.plan, x * (1.0 + 1e-6))
    d_floor = rel_l2(g1, g1r)
    assert d_rewrite < max(3.0 * d_floor, 1e-3), (d_rewrite, d_floor)


def test_lane_align_param_schema_untouched():
    from yolo_series_tpu.models.model import init_model

    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-w6.yaml")
    plan2 = make_lane_align(m.plan)
    # the SAME param/state trees drive both plans (schema untouched):
    # LaneAlignedConv.init delegates to the wrapped conv's init
    p2, s2 = jax.eval_shape(lambda k: init_model(plan2, k),
                            jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(m.params))
    assert (jax.tree_util.tree_structure(s2)
            == jax.tree_util.tree_structure(m.state))


def test_lane_align_skips_aligned_and_ineligible():
    # already-aligned concat (128+128) -> no rewrite
    cfg = {
        "nc": 2,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "conv", [128, 3, 2]],
            [-1, 1, "conv", [128, 3, 1]],
            [[-1, -2], 1, "concat", [1]],
            [-1, 1, "conv", [64, 1, 1]],
        ],
        "head": [[[-1], 1, "idetect", ["nc", "anchors"]]],
    }
    m = Model.from_yaml(cfg)
    assert make_lane_align(m.plan) is m.plan

    # unaligned concat whose consumer is a maxpool -> not a plain conv,
    # must be skipped
    cfg2 = {
        "nc": 2,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "conv", [48, 3, 2]],
            [-1, 1, "conv", [48, 3, 1]],
            [[-1, -2], 1, "concat", [1]],
            [-1, 1, "mp", []],
            [-1, 1, "conv", [64, 1, 1]],
        ],
        "head": [[[-1], 1, "idetect", ["nc", "anchors"]]],
    }
    m2 = Model.from_yaml(cfg2)
    assert make_lane_align(m2.plan) is m2.plan


def test_lane_align_small_exact_train_grads():
    # shallow unaligned-ELAN model: gradients exact to fp32 rounding
    cfg = {
        "nc": 2,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "conv", [48, 3, 2]],
            [-1, 1, "conv", [48, 1, 1]],
            [-2, 1, "conv", [48, 1, 1]],
            [-1, 1, "conv", [48, 3, 1]],
            [[-1, -2, -3], 1, "concat", [1]],
            [-1, 1, "conv", [64, 1, 1]],
        ],
        "head": [[[-1], 1, "idetect", ["nc", "anchors"]]],
    }
    m = Model.from_yaml(cfg)
    plan2 = make_lane_align(m.plan)
    assert sum(isinstance(s.block, LaneAlignedConv)
               for s in plan2.layers) >= 4
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    o1, ns1 = apply_model(m.plan, m.params, m.state, x)
    o2, ns2 = apply_model(plan2, m.params, m.state, x)
    np.testing.assert_allclose(np.asarray(o1["pred"]), np.asarray(o2["pred"]),
                               atol=1e-5, rtol=1e-5)

    def loss(params, plan):
        out, ns = apply_model(plan, params, m.state, x, training=True)
        return sum(jnp.mean(jnp.square(r)) for r in out["raw"]), ns

    (l1, nst1), g1 = jax.value_and_grad(loss, has_aux=True)(m.params, m.plan)
    (l2, nst2), g2 = jax.value_and_grad(loss, has_aux=True)(m.params, plan2)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-6, rtol=1e-6)
    _tree_allclose(nst1, nst2, 1e-5)
    _tree_allclose(g1, g2, 1e-5)
