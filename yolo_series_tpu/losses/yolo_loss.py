"""ComputeLoss — the classic 3-positive YOLOv5/v7 loss, fully vectorized.

Semantics mirror reference utils/loss.py:422-553 (`ComputeLoss`): CIoU box
loss on matched candidates, iou-aware objectness with per-level balance,
BCE classification with optional label smoothing and focal wrapping — but
assignment and losses are computed over static-shape padded candidate
tensors (losses/targets.py) in one jit; no per-level index lists.

Inputs: raw head maps [(B, na, ny, nx, no)] + padded labels (B, M, 5)
[cls, x, y, w, h] normalized + label mask (B, M).
Returns (loss_total, {box, obj, cls}) where loss_total is already
multiplied by batch size (reference loss.py:498 returns loss * bs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.losses.targets import find_positive
from yolo_series_tpu.ops.boxes import bbox_iou


@dataclasses.dataclass(frozen=True)
class LossHyp:
    """Loss hyperparameters (the loss-relevant subset of hyp.scratch yaml,
    pre-scaled by the trainer: box*=3/nl etc., train.py:288-291)."""

    box: float = 0.05
    obj: float = 0.7
    cls: float = 0.3
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0
    gr: float = 1.0          # iou-aware objectness ratio (model.gr)
    aux_w: float = 0.25      # aux head weight (loss.py:1258)


def smooth_bce(eps: float) -> Tuple[float, float]:
    """Positive/negative BCE targets (reference loss.py:11-13)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_logits(logits, targets, pos_weight=1.0):
    """Elementwise BCE-with-logits: softplus(z) - z*t, with pos_weight
    applied as in torch (weight on the positive log term)."""
    ls = jax.nn.log_sigmoid(logits)
    lns = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * ls + (1.0 - targets) * lns)


def focal_scale(logits, targets, gamma, alpha=0.25):
    """Focal modulation factors (reference FocalLoss, loss.py:121-146)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_t * (1.0 - p_t) ** gamma


def _masked_mean(x, mask, axis=None):
    num = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    den = jnp.maximum(jnp.sum(mask.astype(x.dtype), axis=axis), 1.0)
    return num / den


def balance_for(nl: int):
    """Per-level objectness balance (reference loss.py:442)."""
    return [4.0, 1.0, 0.4] if nl == 3 else [4.0, 1.0, 0.25, 0.06, 0.02][:nl]


def make_compute_loss(head, hyp: LossHyp):
    """Build compute_loss(raw, labels, label_mask) for a Detect-family head."""
    nl = len(head.strides)
    na = head.na
    nc = head.nc
    balance = balance_for(nl)
    anchors = np.asarray(head.anchors, np.float32).reshape(nl, na, 2)
    cp, cn = smooth_bce(hyp.label_smoothing)

    def per_level(pi, labels, label_mask, li):
        """pi: (B, na, ny, nx, no)."""
        ny, nx = pi.shape[2], pi.shape[3]
        cand = find_positive(labels, label_mask, anchors[li], (ny, nx),
                             hyp.anchor_t, g=0.5)
        b_sz, m, _, k = cand.gi.shape

        bidx = jax.lax.broadcasted_iota(jnp.int32, cand.gi.shape, 0)
        aidx = jax.lax.broadcasted_iota(jnp.int32, cand.gi.shape, 2)

        flat = lambda x: x.reshape(-1, *x.shape[4:])
        gi, gj = flat(cand.gi), flat(cand.gj)
        bi, ai = flat(bidx), flat(aidx)
        valid = flat(cand.valid)
        tbox = cand.tbox.reshape(-1, 4)
        tcls = jnp.broadcast_to(cand.tcls[:, :, None, None], cand.gi.shape).reshape(-1)
        anc = jnp.broadcast_to(
            cand.anchors[None, None, :, None, :],
            (b_sz, m, na, k, 2)).reshape(-1, 2)

        ps = pi[bi, ai, gj, gi]                       # (N, no) gather

        pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(ps[:, 2:4]) * 2.0) * anc
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, tbox, xywh=True, ciou=True)
        lbox = _masked_mean(1.0 - iou, valid)

        # objectness target map: max-iou per cell among duplicates
        tobj_val = (1.0 - hyp.gr) + hyp.gr * jax.lax.stop_gradient(
            jnp.clip(iou, 0.0))
        tobj = jnp.zeros(pi.shape[:4], pi.dtype)
        drop_b = jnp.where(valid, bi, pi.shape[0])
        tobj = tobj.at[drop_b, ai, gj, gi].max(
            tobj_val.astype(pi.dtype), mode="drop")

        obj_bce = bce_logits(pi[..., 4], tobj, hyp.obj_pw)
        if hyp.fl_gamma > 0:
            obj_bce = obj_bce * focal_scale(pi[..., 4], tobj, hyp.fl_gamma)
        lobj = jnp.mean(obj_bce)

        if nc > 1:
            t = jnp.full((ps.shape[0], nc), cn, ps.dtype)
            t = t.at[jnp.arange(ps.shape[0]), tcls].set(cp)
            cls_bce = bce_logits(ps[:, 5:], t, hyp.cls_pw)
            if hyp.fl_gamma > 0:
                cls_bce = cls_bce * focal_scale(ps[:, 5:], t, hyp.fl_gamma)
            lcls = _masked_mean(jnp.mean(cls_bce, axis=-1), valid)
        else:
            lcls = jnp.float32(0.0)
        return lbox, lobj, lcls

    def compute_loss(raw: Sequence[jnp.ndarray], labels, label_mask):
        lbox = lobj = lcls = jnp.float32(0.0)
        for li in range(nl):
            lb, lo, lc = per_level(raw[li].astype(jnp.float32),
                                   labels, label_mask, li)
            lbox += lb
            lobj += lo * balance[li]
            lcls += lc
        bs = raw[0].shape[0]
        lbox *= hyp.box
        lobj *= hyp.obj
        lcls *= hyp.cls
        total = (lbox + lobj + lcls) * bs
        return total, {"box": lbox, "obj": lobj, "cls": lcls}

    return compute_loss
