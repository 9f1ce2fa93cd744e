"""Fused-stem Pallas transform (ops/pallas_stem.py).

CPU-suite coverage: stem matcher on the real deploy graph, fallback-path
whole-model parity of the plan/params rewrite, and the Pallas kernel in
interpret mode on a small shape (boundary rows included). On-TPU numbers
live in PARITY.md (the suite runs on the forced-CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_series_tpu.models.model import Model, apply_model
from yolo_series_tpu.models.reparam import fuse_model
from yolo_series_tpu.ops import pallas_stem as ps


@pytest.fixture(scope="module")
def fused_yolov7():
    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    return m.plan, params, state


def test_stem_matches_and_rewrites(fused_yolov7, monkeypatch):
    monkeypatch.setenv("YOLO_TPU_PALLAS_STEM", "1")
    plan, params, state = fused_yolov7
    assert ps._stem_matches(plan, params)
    plan2, params2, state2 = ps.make_pallas_stem(plan, params, state)
    assert plan2 is not plan
    assert isinstance(plan2.layers[1].block, ps.FusedStem)
    assert plan2.layers[0].block.pad[0] == (1 + 2 * ps._PAD, 1 + 2 * ps._PAD)
    assert params2["layers"][2] == {} and params2["layers"][3] == {}


def test_transform_noop_on_training_form(monkeypatch):
    """BN-form params (no fuse_model) must leave the plan untouched."""
    monkeypatch.setenv("YOLO_TPU_PALLAS_STEM", "1")
    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
    plan2, _, _ = ps.make_pallas_stem(m.plan, m.params, m.state)
    assert plan2 is m.plan


def test_transform_noop_on_tiny(monkeypatch):
    """yolov7-tiny's stem is a different shape — must not match."""
    monkeypatch.setenv("YOLO_TPU_PALLAS_STEM", "1")
    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    plan2, _, _ = ps.make_pallas_stem(m.plan, params, state)
    assert plan2 is m.plan


def test_fallback_whole_model_parity(fused_yolov7, monkeypatch):
    """Off-TPU the FusedStem runs an XLA chain: same math as the original
    4-conv stem up to bf16 rounding of the re-partitioned convs; the
    whole-model serving output must agree within bf16 tolerance."""
    monkeypatch.setenv("YOLO_TPU_PALLAS_STEM", "1")
    plan, params, state = fused_yolov7
    plan2, params2, state2 = ps.make_pallas_stem(plan, params, state)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    o1, _ = apply_model(plan, params, state, x, training=False,
                        dtype=jnp.bfloat16)
    o2, _ = apply_model(plan2, params2, state2, x, training=False,
                        dtype=jnp.bfloat16)
    p1 = np.asarray(o1["pred"], np.float32)
    p2 = np.asarray(o2["pred"], np.float32)
    assert p1.shape == p2.shape
    # boxes are in grid units (up to ~128); scores in [0,1]
    xy = slice(0, 4)
    assert np.abs(p1[..., xy] - p2[..., xy]).max() <= 1.0
    assert np.abs(p1[..., 4:] - p2[..., 4:]).max() <= 0.05


def test_kernel_interpret_matches_ref(monkeypatch):
    """The Pallas kernel (interpret mode) vs the XLA fallback on a small
    shape, including the image-boundary rows the masking protects."""
    monkeypatch.setenv("YOLO_TPU_PALLAS_INTERPRET", "1")
    HX, W = 32, 32
    C1, CM, CO = 128, 64, 128
    blk = ps.FusedStem(C1, CM, CO)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    params = {
        "wk2": jax.random.normal(ks[0], (2, 2 * C1, CM), jnp.bfloat16) * 0.05,
        "b1": jax.random.normal(ks[1], (CM,), jnp.bfloat16) * 0.1,
        "ws2": jax.random.normal(ks[2], (3, 3 * CM, CM), jnp.bfloat16) * 0.05,
        "b2": jax.random.normal(ks[3], (CM,), jnp.bfloat16) * 0.1,
        "ws3": jax.random.normal(ks[4], (3, 3 * CM, CO), jnp.bfloat16) * 0.05,
        "b3": jax.random.normal(ks[5], (CO,), jnp.bfloat16) * 0.1,
    }
    # pre-padded input, halo rows NON-zero (the masking must zero them)
    x = jax.random.normal(ks[6], (2, HX + 2 * ps._PAD, W, C1), jnp.float32)

    class Ctx:
        dtype = jnp.float32

    ref = np.asarray(blk._ref_apply(params, x, jnp.float32), np.float32)
    out, _ = blk.apply(params, {}, x, Ctx())
    out = np.asarray(out, np.float32)
    assert out.shape == ref.shape == (2, HX // 2, W // 2, CO)
    d = np.abs(out - ref)
    scale = np.abs(ref).max()
    assert d.max() <= 0.05 * max(scale, 1.0), (d.max(), scale)
    edge = np.concatenate([d[:, :2], d[:, -2:]], axis=1)
    assert edge.max() <= 0.05 * max(scale, 1.0)
