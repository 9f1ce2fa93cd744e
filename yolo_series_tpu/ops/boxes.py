"""Box geometry ops (pure jnp, batch-friendly, fully vectorized).

Capability parity with the reference box math in utils/general.py
(xywh2xyxy general.py:275, xyxy2xywh general.py:265, bbox_iou general.py:364,
box_iou general.py:464, bbox_ioa general.py:1407-ish in datasets.py, wh_iou
general.py:497) but written shape-first for XLA: every function broadcasts
over arbitrary leading dims, and the pairwise variants take (..., N, 4) and
(..., M, 4) rather than relying on transposed 4xN layouts.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def xywh2xyxy(x):
    """(..., 4) center-xywh -> corner-xyxy."""
    xy = x[..., 0:2]
    wh = x[..., 2:4] * 0.5
    return jnp.concatenate([xy - wh, xy + wh], axis=-1)


def xyxy2xywh(x):
    """(..., 4) corner-xyxy -> center-xywh."""
    lo = x[..., 0:2]
    hi = x[..., 2:4]
    return jnp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized center-xywh -> pixel corner-xyxy with optional pad offset."""
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    pad = jnp.asarray([padw, padh, padw, padh], dtype=x.dtype)
    return xywh2xyxy(x) * scale + pad

def xyn2xy(x, w=640, h=640, padw=0, padh=0):
    """Normalized (..., 2) points -> pixel coords with pad offset."""
    scale = jnp.asarray([w, h], dtype=x.dtype)
    pad = jnp.asarray([padw, padh], dtype=x.dtype)
    return x * scale + pad


def box_area(box):
    """(..., 4) xyxy -> (...) area."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def box_iou(box1, box2, eps=1e-7):
    """Pairwise IoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Same math as reference utils/general.py:464 (torchvision box_iou):
    inter / (area1 + area2 - inter + eps) with hard-zero clamped overlap.
    """
    lt = jnp.maximum(box1[..., :, None, 0:2], box2[..., None, :, 0:2])
    rb = jnp.minimum(box1[..., :, None, 2:4], box2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(box1)[..., :, None] + box_area(box2)[..., None, :] - inter
    return inter / (union + eps)


def wh_iou(wh1, wh2, eps=1e-7):
    """Pairwise IoU of implicitly-centered wh boxes: (N,2) x (M,2) -> (N,M)."""
    inter = jnp.minimum(wh1[:, None, :], wh2[None, :, :]).prod(-1)
    union = wh1.prod(-1)[:, None] + wh2.prod(-1)[None, :] - inter
    return inter / (union + eps)


def bbox_ioa(box1, box2, eps=1e-7):
    """Intersection over box2 area: (4,) xyxy x (N, 4) xyxy -> (N,)."""
    lt = jnp.maximum(box1[0:2], box2[..., 0:2])
    rb = jnp.minimum(box1[2:4], box2[..., 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (box_area(box2) + eps)


def bbox_iou(box1, box2, xywh=False, giou=False, diou=False, ciou=False, eps=1e-7):
    """Elementwise IoU / GIoU / DIoU / CIoU of aligned box arrays.

    box1, box2: (..., 4), broadcast against each other. `xywh=True` means
    center-format inputs (matches reference `x1y1x2y2=False`). The CIoU
    aspect term treats alpha as a constant (lax.stop_gradient), mirroring
    the reference's `with torch.no_grad()` at utils/general.py:400-402.
    Epsilon placement matches utils/general.py:364-405 exactly (h1/h2 get
    +eps, union gets +eps, convex diag gets +eps) so loss values are
    bit-comparable in fp32.
    """
    import jax

    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2

    inter_w = jnp.clip(jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0.0)
    inter_h = jnp.clip(jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0.0)
    inter = inter_w * inter_h

    w1 = b1[..., 2] - b1[..., 0]
    h1 = b1[..., 3] - b1[..., 1] + eps
    w2 = b2[..., 2] - b2[..., 0]
    h2 = b2[..., 3] - b2[..., 1] + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    ch = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    if ciou or diou:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2[..., 0] + b2[..., 2] - b1[..., 0] - b1[..., 2]) ** 2
                + (b2[..., 1] + b2[..., 3] - b1[..., 1] - b1[..., 3]) ** 2) / 4.0
        if diou:
            return iou - rho2 / c2
        v = (4.0 / math.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
        # Guard the v == 0 && iou ~ 1 corner where fp32 rounding makes the
        # denominator 0 (the reference relies on torch's 0/denom != 0 here).
        denom = v - iou + (1.0 + eps)
        alpha = jax.lax.stop_gradient(jnp.where(v > 0.0, v / jnp.where(v > 0.0, denom, 1.0), 0.0))
        return iou - (rho2 / c2 + v * alpha)
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Rescale xyxy coords from letterboxed img1_shape (h, w) back to img0_shape.

    Mirrors reference utils/general.py:545-563 (gain = min ratio, centered pad),
    including the final clip to image bounds.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    pad4 = jnp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=coords.dtype)
    coords = (coords - pad4) / gain
    return clip_coords(coords, img0_shape)


def clip_coords(boxes, img_shape):
    """Clip xyxy boxes to (h, w) image bounds."""
    h, w = img_shape[0], img_shape[1]
    lim = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(boxes, 0.0, lim)
