"""NMS golden tests vs torchvision.ops.nms (the reference's CUDA kernel, on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_series_tpu.ops.nms import batched_nms, nms_keep_mask, nms_padded

def _greedy_nms_oracle(boxes, scores, thr):
    """Sequential O(n^2) greedy NMS — the trivially-correct oracle."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ix1 = np.maximum(boxes[i, 0], boxes[:, 0])
        iy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        ix2 = np.minimum(boxes[i, 2], boxes[:, 2])
        iy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        iou = inter / (area[i] + area - inter + 1e-7)
        suppressed |= iou > thr
    return np.array(keep, dtype=np.int64)


def _rand_boxes_scores(n, rng, size=640, cluster=True):
    if cluster:
        # overlapping clusters to actually exercise suppression chains
        centers = rng.uniform(100, size - 100, (max(n // 8, 1), 2))
        idx = rng.integers(0, len(centers), n)
        cxy = centers[idx] + rng.normal(0, 20, (n, 2))
    else:
        cxy = rng.uniform(50, size - 50, (n, 2))
    wh = rng.uniform(20, 120, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,tile", [(50, 16), (300, 64), (1000, 256), (513, 128)])
@pytest.mark.parametrize("thr", [0.3, 0.5, 0.65])
def test_keep_mask_matches_torchvision(n, tile, thr):
    rng = np.random.default_rng(n + int(thr * 100))
    boxes, scores = _rand_boxes_scores(n, rng)
    order = np.argsort(-scores)
    boxes_sorted = boxes[order]

    keep = np.asarray(nms_keep_mask(jnp.asarray(boxes_sorted), thr, tile=tile))
    got = order[keep]

    exp = _greedy_nms_oracle(boxes, scores, thr)
    np.testing.assert_array_equal(np.sort(got), np.sort(exp))
    # greedy order check: kept candidates in score order
    np.testing.assert_array_equal(got, exp)


def test_nms_padded_indices():
    rng = np.random.default_rng(7)
    boxes, scores = _rand_boxes_scores(400, rng)
    idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_output=100)
    idx, valid = np.asarray(idx), int(valid)
    exp = _greedy_nms_oracle(boxes, scores, 0.5)[:100]
    assert valid == len(exp)
    np.testing.assert_array_equal(idx[:valid], exp)


def _ref_full_nms(pred, conf, iou, multi_label, max_det=300):
    """Independent numpy re-statement of the non_max_suppression contract."""
    out = []
    for x in pred:
        obj = x[:, 4]
        x = x[obj > conf]
        if not len(x):
            out.append(np.zeros((0, 6), np.float32))
            continue
        cls = x[:, 5:] * x[:, 4:5]
        box = np.concatenate(
            [x[:, :2] - x[:, 2:4] / 2, x[:, :2] + x[:, 2:4] / 2], 1)
        if multi_label:
            i, j = np.nonzero(cls > conf)
            det = np.concatenate([box[i], cls[i, j][:, None], j[:, None].astype(np.float32)], 1)
        else:
            j = cls.argmax(1)
            c = cls[np.arange(len(cls)), j]
            det = np.concatenate([box, c[:, None], j[:, None].astype(np.float32)], 1)
            det = det[c > conf]
        if not len(det):
            out.append(np.zeros((0, 6), np.float32))
            continue
        offs = det[:, 5:6] * 4096.0
        keep = _greedy_nms_oracle(det[:, :4] + offs, det[:, 4], iou)[:max_det]
        out.append(det[keep])
    return out


@pytest.mark.parametrize("multi_label", [False, True])
def test_batched_nms_end_to_end(multi_label):
    rng = np.random.default_rng(11)
    bs, a, nc = 3, 800, 12
    pred = np.zeros((bs, a, 5 + nc), np.float32)
    boxes_scores = [_rand_boxes_scores(a, np.random.default_rng(100 + i)) for i in range(bs)]
    for i, (boxes, scores) in enumerate(boxes_scores):
        xywh = np.concatenate([(boxes[:, :2] + boxes[:, 2:]) / 2, boxes[:, 2:] - boxes[:, :2]], 1)
        pred[i, :, :4] = xywh
        pred[i, :, 4] = scores
        cls_p = rng.dirichlet(np.ones(nc) * 0.2, a).astype(np.float32)
        pred[i, :, 5:] = cls_p

    got = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                      multi_label=multi_label, max_det=50)
    exp = _ref_full_nms(pred, 0.25, 0.45, multi_label, max_det=50)

    for i in range(bs):
        n = int(got.num_dets[i])
        assert n == len(exp[i]), f"image {i}: {n} vs {len(exp[i])}"
        np.testing.assert_allclose(np.asarray(got.boxes[i, :n]), exp[i][:, :4], rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(got.scores[i, :n]), exp[i][:, 4], rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.classes[i, :n]), exp[i][:, 5].astype(np.int32))


def test_batched_nms_classes_filter():
    rng = np.random.default_rng(13)
    pred = rng.uniform(0, 1, (1, 200, 5 + 8)).astype(np.float32)
    pred[..., :2] = rng.uniform(100, 500, (1, 200, 2))
    pred[..., 2:4] = rng.uniform(20, 80, (1, 200, 2))
    out = batched_nms(jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5,
                      classes=(1, 3), max_det=50)
    n = int(out.num_dets[0])
    assert n > 0
    assert set(np.asarray(out.classes[0, :n]).tolist()) <= {1, 3}


@pytest.mark.parametrize("n,thr", [(100, 0.45), (700, 0.5), (1000, 0.65)])
def test_keep_mask_full_matches_tiled(n, thr):
    from yolo_series_tpu.ops.nms import nms_keep_mask_full

    rng = np.random.default_rng(n)
    boxes, scores = _rand_boxes_scores(n, rng)
    order = np.argsort(-scores)
    boxes_sorted = boxes[order]
    full = np.asarray(nms_keep_mask_full(jnp.asarray(boxes_sorted), thr))
    exp = _greedy_nms_oracle(boxes, scores, thr)
    np.testing.assert_array_equal(order[full], exp)


def test_pallas_nms_kernel_interpret():
    """Pallas NMS kernel (interpret mode on CPU) matches the greedy oracle."""
    from yolo_series_tpu.ops.pallas_nms import nms_keep_mask_pallas

    rng = np.random.default_rng(3)
    B, K = 4, 128
    boxes_list, keep_exp = [], []
    for i in range(B):
        boxes, scores = _rand_boxes_scores(K, np.random.default_rng(50 + i))
        order = np.argsort(-scores)
        b = boxes[order]
        boxes_list.append(b)
        exp_idx = _greedy_nms_oracle(b, -np.arange(K, dtype=np.float32), 0.45)
        mask = np.zeros(K, bool)
        mask[exp_idx] = True
        keep_exp.append(mask)
    boxes = np.stack(boxes_list).astype(np.float32)
    valid = np.ones((B, K), bool)
    keep = np.asarray(nms_keep_mask_pallas(
        jnp.asarray(boxes), jnp.asarray(valid), 0.45, interpret=True))
    np.testing.assert_array_equal(keep, np.stack(keep_exp))


def test_fused_head_nms_matches_standard_path():
    """ops/nms.fused_head_nms (serving fast path) == decode + NMS."""
    import functools

    import jax
    import jax.numpy as jnp

    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.nms import _single_image_nms, fused_head_nms

    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    plan = m.plan
    head = plan.head
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32))

    out, _ = apply_model(plan, params, state, x, training=False)
    nms_fn = functools.partial(
        _single_image_nms, conf_thres=0.25, iou_thres=0.45, multi_label=False,
        agnostic=False, max_det=50, max_nms=256, max_wh=4096.0, nc=plan.nc,
        tile=256, class_mask=None, score_dtype=jnp.float32)
    want = jax.vmap(nms_fn)(out["pred"])

    feats, _ = apply_model(plan, params, state, x, training=False,
                           return_head_inputs=True)
    hp = params["layers"][-1]
    got = fused_head_nms(head, hp, feats, conf_thres=0.25, iou_thres=0.45,
                         max_det=50, max_nms=256, compute_dtype=jnp.float32)

    for b in range(2):
        n_w, n_g = int(want[0][b]), int(got[0][b])
        assert n_g == n_w, (n_g, n_w)
        # detections may appear in different order at exact score ties;
        # compare as score-sorted sets
        def rows(res):
            n = int(res[0][b])
            r = np.concatenate([np.asarray(res[1][b][:n]),
                                np.asarray(res[2][b][:n, None]),
                                np.asarray(res[3][b][:n, None])], 1)
            return r[np.lexsort(r.T)]
        np.testing.assert_allclose(rows(got), rows(want), rtol=1e-4,
                                   atol=1e-3)


def test_batched_nms_kpt_matches_reference():
    """Keypoint NMS vs reference non_max_suppression_kpt
    (general.py:723-780, kpt_label=True)."""
    import torch

    import jax.numpy as jnp

    from tests.ref_oracle import has_reference, load_reference
    if not has_reference():
        pytest.skip("reference repo unavailable")
    load_reference()
    from utils.general import non_max_suppression_kpt

    from yolo_series_tpu.ops.nms import batched_nms_kpt

    rng = np.random.default_rng(0)
    b, a, nkpt = 2, 400, 17
    pred = np.zeros((b, a, 6 + 3 * nkpt), np.float32)
    pred[..., 0:2] = rng.uniform(50, 600, (b, a, 2))       # cx, cy
    pred[..., 2:4] = rng.uniform(10, 120, (b, a, 2))       # w, h
    pred[..., 4] = rng.uniform(0, 1, (b, a)) ** 2          # obj
    pred[..., 5] = rng.uniform(0.5, 1, (b, a))             # single cls
    pred[..., 6:] = rng.uniform(0, 640, (b, a, 3 * nkpt))

    want = non_max_suppression_kpt(torch.from_numpy(pred), conf_thres=0.25,
                                   iou_thres=0.45, kpt_label=True)
    num, boxes, scores, classes, kpts = batched_nms_kpt(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=300,
        max_nms=400)

    for i in range(b):
        w = want[i].numpy()
        n = int(num[i])
        assert n == len(w), (n, len(w))
        order_w = np.argsort(-w[:, 4], kind="stable")
        np.testing.assert_allclose(np.asarray(boxes[i][:n]),
                                   w[order_w, :4], rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(scores[i][:n]),
                                   w[order_w, 4], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(kpts[i][:n]),
                                   w[order_w, 6:], rtol=1e-5, atol=1e-3)
