"""ComputeLossBinOTA — OTA assignment + SigmoidBin w/h losses for the IBin
head (reference utils/loss.py:848-1172).

Channel layout per anchor: [x, y, w_bin(bl), h_bin(bl), obj, cls...] with
bl = bin_count + 1; assignment costs decode w/h through SigmoidBin.forward
(loss.py:1018-1019) and the box loss adds the bin training losses
(BCE-over-bins + MSE residual) to the CIoU term (loss.py:910-929).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.losses.bin import SigmoidBin
from yolo_series_tpu.losses.ota import K_OFFSETS, ota_assign_batch
from yolo_series_tpu.losses.targets import find_positive
from yolo_series_tpu.losses.yolo_loss import (
    LossHyp, _masked_mean, balance_for, bce_logits, smooth_bce,
)
from yolo_series_tpu.ops.boxes import bbox_iou


def make_compute_loss_bin_ota(head, hyp: LossHyp,
                              topk: int = 10):
    nl = len(head.strides)
    balance = balance_for(nl)
    anchors = np.asarray(head.anchors, np.float32).reshape(nl, head.na, 2)
    strides = np.asarray(head.strides, np.float32)
    # BCE-over-bins only: the driver disables the MSE residual term
    # (loss.py:876: use_loss_regression=False); the residual still shapes
    # the DECODED w/h feeding the CIoU term
    sb = SigmoidBin(head.bin_count, 0.0, 4.0, use_loss_regression=False)
    bl = sb.length
    obj_idx = 2 * bl + 2
    nc = head.nc
    cp, cn = smooth_bce(hyp.label_smoothing)

    def wh_decode(ps, anc):
        y = jax.nn.sigmoid(ps)
        pw = sb.forward(y[:, 2:2 + bl]) * anc[:, 0]
        ph = sb.forward(y[:, 2 + bl:obj_idx]) * anc[:, 1]
        return jnp.stack([pw, ph], -1)

    codec = {"obj_idx": obj_idx, "wh_decode": wh_decode}

    def compute_loss(raw: Sequence[jnp.ndarray], labels, label_mask):
        raw = [r.astype(jnp.float32) for r in raw[:nl]]
        bs = raw[0].shape[0]
        fg, mg, offs = ota_assign_batch(raw, labels, label_mask, anchors,
                                        strides, hyp, g=0.5,
                                        topk=topk, codec=codec)
        lbox = lobj = lcls = jnp.float32(0.0)
        m = labels.shape[1]
        na = head.na
        for li in range(nl):
            pi = raw[li]
            ny, nx = pi.shape[2], pi.shape[3]
            fg_l = fg[:, offs[li]:offs[li + 1]]
            mg_l = mg[:, offs[li]:offs[li + 1]]
            mshape = (bs, m, na, K_OFFSETS)
            cand = find_positive(labels, label_mask, anchors[li], (ny, nx),
                                 hyp.anchor_t, g=0.5)
            gi = cand.gi.reshape(bs, -1)
            gj = cand.gj.reshape(bs, -1)
            ai = jax.lax.broadcasted_iota(jnp.int32, mshape, 2).reshape(bs, -1)
            bi = jax.lax.broadcasted_iota(jnp.int32, gi.shape, 0)
            ps = pi[bi, ai, gj, gi]

            sel = labels[bi, mg_l][..., 1:5]
            gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
            tb = sel * gain
            grid = jnp.stack([gi, gj], -1).astype(jnp.float32)
            tb = tb.at[..., 0:2].add(-grid)

            anc = jnp.broadcast_to(
                jnp.asarray(anchors[li])[None, None, :, None, :],
                mshape + (2,)).reshape(bs, -1, 2)
            # bin training losses on w/h ratios (loss.py:910-913)
            w_loss, pw = sb.training_loss(ps[..., 2:2 + bl],
                                          tb[..., 2] / anc[..., 0], valid=fg_l)
            h_loss, ph = sb.training_loss(ps[..., 2 + bl:obj_idx],
                                          tb[..., 3] / anc[..., 1], valid=fg_l)
            pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
            pbox = jnp.concatenate(
                [pxy, (pw * anc[..., 0])[..., None], (ph * anc[..., 1])[..., None]], -1)
            iou = bbox_iou(pbox, tb, xywh=True, ciou=True)
            lbox += w_loss + h_loss + _masked_mean(1.0 - iou, fg_l)

            tobj_val = (1.0 - hyp.gr) + hyp.gr * jax.lax.stop_gradient(
                jnp.clip(iou, 0.0))
            tobj = jnp.zeros(pi.shape[:4], pi.dtype)
            drop_b = jnp.where(fg_l, bi, bs)
            tobj = tobj.at[drop_b, ai, gj, gi].max(tobj_val, mode="drop")
            lobj += jnp.mean(bce_logits(pi[..., obj_idx], tobj,
                                        hyp.obj_pw)) * balance[li]

            if nc > 1:
                tcls = labels[bi, mg_l][..., 0].astype(jnp.int32)
                t = jnp.full(ps[..., obj_idx + 1:].shape, cn, jnp.float32)
                t = jnp.where(jax.nn.one_hot(tcls, nc, dtype=bool), cp, t)
                lcls += _masked_mean(
                    jnp.mean(bce_logits(ps[..., obj_idx + 1:], t, hyp.cls_pw),
                             -1), fg_l)

        lbox *= hyp.box
        lobj *= hyp.obj
        lcls *= hyp.cls
        total = (lbox + lobj + lcls) * bs
        return total, {"box": lbox, "obj": lobj, "cls": lcls}

    return compute_loss
