"""Serving engine, INT8 quantization, TTA, and COCO-protocol eval tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_series_tpu.models.model import Model, apply_model
from yolo_series_tpu.models.reparam import fuse_model


@pytest.fixture(scope="module")
def tiny_fused():
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
                        key=jax.random.PRNGKey(0))
    params, state = fuse_model(m.plan, m.params, m.state)
    return m.plan, params, state


def test_serving_engine_contract(tiny_fused):
    from yolo_series_tpu.infer.serving import ServingEngine

    plan, params, state = tiny_fused
    eng = ServingEngine(plan, params, state, batch_size=2, img_size=128,
                        max_det=50, dtype=jnp.float32)
    x = np.random.default_rng(0).integers(0, 255, (2, 128, 128, 3),
                                          dtype=np.uint8)
    out = eng.infer(x)
    assert set(out) == {"num_dets", "det_boxes", "det_scores", "det_classes"}
    assert out["num_dets"].shape == (2, 1)
    assert out["det_boxes"].shape == (2, 50, 4)
    # partial batch pads and trims
    out1 = eng.infer(x[:1])
    assert out1["det_boxes"].shape == (1, 50, 4)
    np.testing.assert_allclose(out1["det_boxes"], out["det_boxes"][:1],
                               atol=1e-3)


def test_dynamic_batcher(tiny_fused):
    from yolo_series_tpu.infer.serving import DynamicBatcher, ServingEngine

    plan, params, state = tiny_fused
    eng = ServingEngine(plan, params, state, batch_size=4, img_size=128,
                        max_det=20, dtype=jnp.float32)
    batcher = DynamicBatcher(eng, max_delay_ms=20)
    rng = np.random.default_rng(1)
    slots = [batcher.submit(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8))
             for _ in range(6)]
    for s in slots:
        res = DynamicBatcher.wait(s, timeout=60)
        assert res is not None and res["det_boxes"].shape == (20, 4)
    batcher.close()


def test_int8_quantization_close_to_fp(tiny_fused):
    from yolo_series_tpu.infer.quant import quantize_model

    plan, params, state = tiny_fused
    qparams, qstate = quantize_model(plan, params, state)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3))
    out_fp, _ = apply_model(plan, params, state, x, training=False)
    out_q, _ = apply_model(plan, qparams, qstate, x, training=False)
    p_fp = np.asarray(out_fp["pred"])
    p_q = np.asarray(out_q["pred"])
    # class/obj probabilities shouldn't move much under int8
    assert np.abs(p_q[..., 4:] - p_fp[..., 4:]).mean() < 0.02
    # boxes within a few pixels on average
    assert np.abs(p_q[..., :2] - p_fp[..., :2]).mean() < 3.0


def test_quantized_tree_is_int8(tiny_fused):
    from yolo_series_tpu.infer.quant import quantize_model

    plan, params, state = tiny_fused
    qparams, _ = quantize_model(plan, params, state)
    leaves = jax.tree_util.tree_flatten_with_path(qparams)[0]
    n_int8 = sum(1 for p, l in leaves
                 if hasattr(l, "dtype") and l.dtype == jnp.int8)
    assert n_int8 > 50  # every conv weight quantized


def test_tta_shapes(tiny_fused):
    from yolo_series_tpu.models.tta import apply_model_tta

    plan, params, state = tiny_fused
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 128, 3))
    pred = apply_model_tta(plan, params, state, x)
    base, _ = apply_model(plan, params, state, x, training=False)
    assert pred.shape[1] > base["pred"].shape[1]  # 3 scales concatenated
    assert pred.shape[2] == base["pred"].shape[2]


def test_coco_eval_perfect_predictions():
    from yolo_series_tpu.eval.coco_eval import COCOEvaluator

    gt = {"images": [{"id": 1}, {"id": 2}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [10, 10, 50, 40], "area": 2000, "iscrowd": 0},
              {"id": 2, "image_id": 1, "category_id": 2,
               "bbox": [100, 100, 30, 30], "area": 900, "iscrowd": 0},
              {"id": 3, "image_id": 2, "category_id": 1,
               "bbox": [5, 5, 120, 120], "area": 14400, "iscrowd": 0}],
          "categories": [{"id": 1}, {"id": 2}]}
    res = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 40], "score": 0.9},
           {"image_id": 1, "category_id": 2, "bbox": [100, 100, 30, 30], "score": 0.8},
           {"image_id": 2, "category_id": 1, "bbox": [5, 5, 120, 120], "score": 0.95}]
    ev = COCOEvaluator(gt, res)
    out = ev.summarize(verbose=False)
    assert out["AP"] == pytest.approx(1.0, abs=1e-6)
    assert out["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_coco_eval_half_wrong():
    from yolo_series_tpu.eval.coco_eval import COCOEvaluator

    gt = {"images": [{"id": 1}],
          "annotations": [
              {"id": i, "image_id": 1, "category_id": 1,
               "bbox": [100 * i, 10, 50, 40], "area": 2000, "iscrowd": 0}
              for i in range(1, 5)],
          "categories": [{"id": 1}]}
    # 2 perfect hits + 2 far-off false positives with lower scores
    res = [{"image_id": 1, "category_id": 1, "bbox": [100, 10, 50, 40], "score": 0.9},
           {"image_id": 1, "category_id": 1, "bbox": [200, 10, 50, 40], "score": 0.85},
           {"image_id": 1, "category_id": 1, "bbox": [900, 900, 10, 10], "score": 0.5},
           {"image_id": 1, "category_id": 1, "bbox": [950, 950, 10, 10], "score": 0.4}]
    ev = COCOEvaluator(gt, res)
    out = ev.summarize(verbose=False)
    assert 0.4 < out["AP50"] < 0.6  # recall caps at 0.5
