"""Golden tests for box math vs independent numpy / torchvision oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_series_tpu.ops import boxes as B


def _rand_xyxy(n, rng, size=640):
    x1 = rng.uniform(0, size * 0.9, (n, 1))
    y1 = rng.uniform(0, size * 0.9, (n, 1))
    w = rng.uniform(1, size * 0.5, (n, 1))
    h = rng.uniform(1, size * 0.5, (n, 1))
    return np.concatenate([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    b = _rand_xyxy(64, rng)
    out = np.asarray(B.xywh2xyxy(B.xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-3)


def test_box_iou_vs_numpy():
    rng = np.random.default_rng(1)
    a = _rand_xyxy(37, rng)
    b = _rand_xyxy(53, rng)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))

    # independent O(n*m) oracle
    exp = np.zeros((37, 53), np.float64)
    for i in range(37):
        for j in range(53):
            ix1 = max(a[i, 0], b[j, 0]); iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2]); iy2 = min(a[i, 3], b[j, 3])
            inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            exp[i, j] = inter / (area_a + area_b - inter + 1e-7)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_box_iou_vs_reference():
    """Golden vs the reference's own pure-torch box_iou
    (utils/general.py) — a stronger oracle than torchvision's."""
    import torch

    from tests.ref_oracle import has_reference, load_reference
    if not has_reference():
        pytest.skip("reference repo unavailable")
    load_reference()
    from utils.general import box_iou as ref_box_iou

    rng = np.random.default_rng(2)
    a = _rand_xyxy(40, rng)
    b = _rand_xyxy(25, rng)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    exp = ref_box_iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_ciou_properties():
    rng = np.random.default_rng(3)
    a = _rand_xyxy(100, rng)
    # identical boxes -> CIoU == 1
    same = np.asarray(B.bbox_iou(jnp.asarray(a), jnp.asarray(a), ciou=True))
    np.testing.assert_allclose(same, 1.0, atol=1e-4)
    # CIoU <= IoU always
    b = _rand_xyxy(100, rng)
    iou = np.asarray(B.bbox_iou(jnp.asarray(a), jnp.asarray(b)))
    ciou = np.asarray(B.bbox_iou(jnp.asarray(a), jnp.asarray(b), ciou=True))
    assert np.all(ciou <= iou + 1e-6)
    giou = np.asarray(B.bbox_iou(jnp.asarray(a), jnp.asarray(b), giou=True))
    assert np.all(giou <= iou + 1e-6)


def test_bbox_iou_xywh_matches_xyxy():
    rng = np.random.default_rng(4)
    a = _rand_xyxy(30, rng)
    b = _rand_xyxy(30, rng)
    a_xywh = np.asarray(B.xyxy2xywh(jnp.asarray(a)))
    b_xywh = np.asarray(B.xyxy2xywh(jnp.asarray(b)))
    v1 = np.asarray(B.bbox_iou(jnp.asarray(a), jnp.asarray(b), ciou=True))
    v2 = np.asarray(B.bbox_iou(jnp.asarray(a_xywh), jnp.asarray(b_xywh), xywh=True, ciou=True))
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)


def test_scale_coords():
    # 640x640 letterboxed from a 480x640 original: gain 1.0, pad (0, 80)
    coords = jnp.asarray([[100.0, 160.0, 200.0, 260.0]])
    out = np.asarray(B.scale_coords((640, 640), coords, (480, 640)))
    np.testing.assert_allclose(out, [[100.0, 80.0, 200.0, 180.0]], atol=1e-4)
