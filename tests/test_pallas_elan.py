"""Fused-ELAN Pallas transform (ops/pallas_elan.py).

CPU-suite coverage: span matcher on the real deploy graph, fallback-path
bit-exactness of the plan/params rewrite, and the Pallas kernel itself in
interpret mode on a small shape. The on-TPU kernel/e2e parity numbers are
recorded in PARITY.md (the suite runs on the forced-CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_series_tpu.models.model import Model, apply_model
from yolo_series_tpu.models.reparam import fuse_model
from yolo_series_tpu.ops import pallas_elan as pe


@pytest.fixture(scope="module")
def fused_yolov7():
    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    return m.plan, params, state


def test_find_spans_yolov7(fused_yolov7):
    plan, params, _ = fused_yolov7
    spans = pe.find_elan_spans(plan, params)
    assert spans == ((4, "backbone"), (17, "backbone"), (30, "backbone"),
                     (43, "backbone"), (56, "head"), (68, "head"),
                     (81, "head"), (94, "head"))


def test_transform_fallback_bit_exact(fused_yolov7):
    """Off-TPU the FusedELAN block runs an XLA chain with the packed
    weights; the whole-model output must be bit-exact vs the unfused
    serving program (it is the same math on the same bf16 weights)."""
    plan, params, state = fused_yolov7
    plan2, params2, state2 = pe.make_pallas_elan(plan, params, state,
                                                 force=True)
    assert plan2 is not plan
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    o1, _ = apply_model(plan, params, state, x, training=False,
                        dtype=jnp.bfloat16)
    o2, _ = apply_model(plan2, params2, state2, x, training=False,
                        dtype=jnp.bfloat16)
    p1 = np.asarray(o1["pred"], np.float32)
    p2 = np.asarray(o2["pred"], np.float32)
    assert p1.shape == p2.shape
    assert np.array_equal(p1, p2)


def test_transform_noop_on_training_form():
    """BN-form params (no fuse_model) must leave the plan untouched."""
    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
    plan2, params2, state2 = pe.make_pallas_elan(m.plan, m.params, m.state,
                                                 force=True)
    assert plan2 is m.plan


@pytest.mark.parametrize("order", ["backbone", "head"])
def test_kernel_interpret_matches_ref(order, monkeypatch):
    """The actual Pallas kernel (interpret mode) vs the XLA fallback on a
    small shape, including the image-boundary rows the masking protects."""
    monkeypatch.setenv("YOLO_TPU_PALLAS_INTERPRET", "1")
    H = W = 16
    cin, ct, cc = 32, 32, 32
    cat = (4 * cc + 2 * ct) if order == "head" else (2 * cc + 2 * ct)
    cout = 64
    blk = pe.FusedELAN(cin, ct, cc, cout, order)
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    params = {
        "w4": jax.random.normal(ks[0], (cin, ct), jnp.bfloat16) * 0.1,
        "b4": jax.random.normal(ks[1], (ct,), jnp.bfloat16) * 0.1,
        "w5": jax.random.normal(ks[2], (cin, ct), jnp.bfloat16) * 0.1,
        "b5": jax.random.normal(ks[3], (ct,), jnp.bfloat16) * 0.1,
        "wc0": jax.random.normal(ks[4], (3, 3 * ct, cc), jnp.bfloat16) * 0.05,
        "bc0": jax.random.normal(ks[5], (cc,), jnp.bfloat16) * 0.1,
        "wc": jax.random.normal(ks[6], (3, 3, 3 * cc, cc), jnp.bfloat16) * 0.05,
        "bc": jax.random.normal(ks[7], (3, cc), jnp.bfloat16) * 0.1,
        "w11": jax.random.normal(ks[8], (cat, cout), jnp.bfloat16) * 0.05,
        "b11": jax.random.normal(ks[9], (cout,), jnp.bfloat16) * 0.1,
    }
    x = jax.random.normal(ks[10], (2, H, W, cin), jnp.float32)

    class Ctx:
        dtype = jnp.float32

    ref = np.asarray(blk._ref_apply(params, x, jnp.float32), np.float32)
    out, _ = blk.apply(params, {}, x, Ctx())
    out = np.asarray(out, np.float32)
    assert out.shape == ref.shape == (2, H, W, cout)
    # both paths are bf16 compute; tolerate bf16 accumulation-order noise
    d = np.abs(out - ref)
    scale = np.abs(ref).max()
    assert d.max() <= 0.05 * max(scale, 1.0), (d.max(), scale)
    # boundary rows specifically (the masking semantics)
    edge = np.concatenate([d[:, :2], d[:, -2:]], axis=1)
    assert edge.max() <= 0.05 * max(scale, 1.0)
