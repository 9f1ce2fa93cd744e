"""ComputeLossOTA — SimOTA dynamic label assignment, batch-vectorized.

The reference implementation (utils/loss.py:556-845) loops over images in
Python, concatenates variable-length candidate lists per level, and runs
topk/argmin on the host per ground truth. Here the entire assignment is a
static-shape computation vmapped over the batch:

  * candidates = every (gt, level, anchor, offset) slot from the
    three-positive scheme (losses/targets.py), C = M * nl * na * 5 columns
    with a validity bit — no boolean compression;
  * the (M, C, nc) pairwise classification-cost tensor never materializes:
    for one-hot targets, sum_c BCE(z_c, t_c) = sum_c softplus(z_c) -
    z_{gt_cls}, i.e. one per-candidate reduction + one gather;
  * dynamic-k selection (k = clamp(sum top-10 IoU, 1), loss.py:714-715)
    uses a top-10 over the cost row + rank mask — exact, no host sync;
  * conflict resolution keeps argmin-cost gt per candidate column
    (loss.py:747-751).

The resulting assignment drives the same loss shape as ComputeLoss
(CIoU box + iou-aware obj + BCE cls, loss.py:589-635).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.losses.targets import find_positive
from yolo_series_tpu.losses.yolo_loss import (
    LossHyp, _masked_mean, balance_for, bce_logits, focal_scale, smooth_bce,
)
from yolo_series_tpu.ops.boxes import bbox_iou, box_iou, xywh2xyxy


def _gather_level(pi, cand, li):
    """Flatten one level's candidates for a single image.

    pi: (na, ny, nx, no); cand arrays: (M, na, K).
    Returns per-candidate (C_l = M*na*K): preds (C_l, no), gi, gj, ai.
    """
    m, na, k = cand.gi.shape
    gi = cand.gi.reshape(-1)
    gj = cand.gj.reshape(-1)
    ai = jax.lax.broadcasted_iota(jnp.int32, (m, na, k), 1).reshape(-1)
    ps = pi[ai, gj, gi]
    return ps, gi, gj, ai


def make_compute_loss_ota(head, hyp: LossHyp, img_size: int):
    """Build compute_loss_ota(raw, labels, label_mask).

    img_size: training image size (the reference scales target boxes by
    imgs.shape[1], loss.py:668 — square images assumed, as in training).
    """
    nl = len(head.strides)
    na = head.na
    nc = head.nc
    balance = balance_for(nl)
    anchors = np.asarray(head.anchors, np.float32).reshape(nl, na, 2)
    strides = np.asarray(head.strides, np.float32)
    cp, cn = smooth_bce(hyp.label_smoothing)
    k_offsets = 5

    def assign_single(raw_img, labels, label_mask, grids):
        """SimOTA assignment for ONE image.

        raw_img: list of (na, ny, nx, no); labels (M, 5); label_mask (M,).
        Returns per-level dicts of static shape C_l with fg mask and the
        matched gt index per candidate.
        """
        m = labels.shape[0]

        cands = []
        for li in range(nl):
            ny, nx = grids[li]
            c = find_positive(labels[None], label_mask[None], anchors[li],
                              (ny, nx), hyp.anchor_t, g=0.5)
            # strip the singleton batch dim
            cands.append(type(c)(gi=c.gi[0], gj=c.gj[0], valid=c.valid[0],
                                 tbox=c.tbox[0], tcls=c.tcls[0],
                                 anchors=c.anchors))

        # per-candidate decoded boxes in pixels (loss.py:691-696)
        all_ps, all_valid, all_xyxy, lvl_sizes = [], [], [], []
        for li in range(nl):
            c = cands[li]
            ps, gi, gj, ai = _gather_level(raw_img[li], c, li)
            anc = jnp.broadcast_to(
                c.anchors[None, :, None, :], (m, na, k_offsets, 2)).reshape(-1, 2)
            grid = jnp.stack([gi, gj], -1).astype(jnp.float32)
            pxy = (jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5 + grid) * strides[li]
            pwh = jnp.square(jax.nn.sigmoid(ps[:, 2:4]) * 2.0) * anc * strides[li]
            all_xyxy.append(xywh2xyxy(jnp.concatenate([pxy, pwh], -1)))
            all_ps.append(ps)
            all_valid.append(c.valid.reshape(-1))
            lvl_sizes.append(ps.shape[0])

        p_xyxy = jnp.concatenate(all_xyxy, 0)          # (C, 4)
        p_all = jnp.concatenate(all_ps, 0)             # (C, no)
        v_all = jnp.concatenate(all_valid, 0)          # (C,)
        c_total = p_xyxy.shape[0]

        t_xyxy = xywh2xyxy(labels[:, 1:5] * img_size)  # (M, 4) pixels
        gt_valid = label_mask

        pair_iou = box_iou(t_xyxy, p_xyxy)             # (M, C)
        pair_iou = jnp.where(gt_valid[:, None] & v_all[None, :], pair_iou, 0.0)
        iou_cost = -jnp.log(pair_iou + 1e-8)

        # dynamic k per gt = clamp(int(sum top-10 iou), min 1)
        top10 = jax.lax.top_k(pair_iou, min(10, c_total))[0]
        dyn_k = jnp.clip(jnp.sum(top10, -1).astype(jnp.int32), 1, None)  # (M,)

        # classification cost without the (M, C, nc) tensor
        obj_l = p_all[:, 4:5]
        cls_l = p_all[:, 5:]
        y = jnp.sqrt(jax.nn.sigmoid(cls_l) * jax.nn.sigmoid(obj_l))
        z = jnp.log(y / (1.0 - y + 1e-12) + 1e-12)     # logit(y), (C, nc)
        sp_sum = jnp.sum(jax.nn.softplus(z), axis=-1)  # (C,)
        gt_cls = labels[:, 0].astype(jnp.int32)
        z_at_cls = z[:, gt_cls].T                      # (M, C)
        cls_cost = sp_sum[None, :] - z_at_cls

        big = 1e8
        cost = cls_cost + 3.0 * iou_cost
        cost = jnp.where(gt_valid[:, None] & v_all[None, :], cost, big)

        # per-gt top-k (k <= 10) smallest-cost candidates
        k_max = min(10, c_total)
        neg_top, top_idx = jax.lax.top_k(-cost, k_max)  # (M, k_max)
        rank_ok = (jax.lax.broadcasted_iota(jnp.int32, (m, k_max), 1)
                   < dyn_k[:, None]) & (-neg_top < big * 0.5)
        matching = jnp.zeros((m, c_total), bool)
        row = jax.lax.broadcasted_iota(jnp.int32, (m, k_max), 0)
        matching = matching.at[row, top_idx].set(rank_ok)

        # conflict resolution: candidate claimed by >1 gt -> argmin cost
        claims = jnp.sum(matching, 0)
        best_gt = jnp.argmin(cost, 0)                  # (C,)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, c_total), 0)
        exclusive = row_ids == best_gt[None, :]
        matching = jnp.where(claims[None, :] > 1, matching & exclusive, matching)

        fg = jnp.any(matching, 0) & v_all              # (C,)
        matched_gt = jnp.argmax(matching, 0)           # (C,)
        return fg, matched_gt, lvl_sizes

    def compute_loss(raw: Sequence[jnp.ndarray], labels, label_mask):
        """raw: [(B, na, ny, nx, no)] lead maps; labels (B, M, 5); mask (B, M)."""
        raw = [r.astype(jnp.float32) for r in raw[:nl]]
        bs = raw[0].shape[0]
        grids = tuple((r.shape[2], r.shape[3]) for r in raw)

        def assign_wrap(raw_img, labels_i, mask_i):
            fg_i, mg_i, _ = assign_single(raw_img, labels_i, mask_i, grids)
            return fg_i, mg_i

        fg, matched_gt = jax.vmap(assign_wrap)(raw, labels, label_mask)
        fg = jax.lax.stop_gradient(fg)
        matched_gt = jax.lax.stop_gradient(matched_gt)

        # split per level (static offsets)
        sizes = [labels.shape[1] * na * k_offsets for _ in range(nl)]
        offs = np.cumsum([0] + sizes)

        lbox = lobj = lcls = jnp.float32(0.0)
        for li in range(nl):
            pi = raw[li]
            ny, nx = grids[li]
            fg_l = fg[:, offs[li]:offs[li + 1]]            # (B, C_l)
            mg_l = matched_gt[:, offs[li]:offs[li + 1]]    # (B, C_l)

            mshape = (bs, labels.shape[1], na, k_offsets)
            # regenerate candidate geometry (cheap, keeps assign pure)
            cand = find_positive(labels, label_mask, anchors[li], (ny, nx),
                                 hyp.anchor_t, g=0.5)
            gi = cand.gi.reshape(bs, -1)
            gj = cand.gj.reshape(bs, -1)
            ai = jax.lax.broadcasted_iota(jnp.int32, mshape, 2).reshape(bs, -1)
            bi = jax.lax.broadcasted_iota(jnp.int32, gi.shape, 0)

            ps = pi[bi, ai, gj, gi]                         # (B, C_l, no)

            # matched target boxes in grid units of this level
            sel = labels[bi, mg_l][..., 1:5]
            gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
            tb = sel * gain
            grid = jnp.stack([gi, gj], -1).astype(jnp.float32)
            tb = tb.at[..., 0:2].add(-grid)

            anc = jnp.broadcast_to(
                jnp.asarray(anchors[li])[None, None, :, None, :], mshape + (2,)
            ).reshape(bs, -1, 2)
            pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
            pwh = jnp.square(jax.nn.sigmoid(ps[..., 2:4]) * 2.0) * anc
            pbox = jnp.concatenate([pxy, pwh], -1)
            iou = bbox_iou(pbox, tb, xywh=True, ciou=True)
            lbox += _masked_mean(1.0 - iou, fg_l)

            tobj_val = (1.0 - hyp.gr) + hyp.gr * jax.lax.stop_gradient(
                jnp.clip(iou, 0.0))
            tobj = jnp.zeros(pi.shape[:4], pi.dtype)
            drop_b = jnp.where(fg_l, bi, bs)
            tobj = tobj.at[drop_b, ai, gj, gi].max(tobj_val, mode="drop")
            obj_bce = bce_logits(pi[..., 4], tobj, hyp.obj_pw)
            if hyp.fl_gamma > 0:
                obj_bce = obj_bce * focal_scale(pi[..., 4], tobj, hyp.fl_gamma)
            lobj += jnp.mean(obj_bce) * balance[li]

            if nc > 1:
                tcls = labels[bi, mg_l][..., 0].astype(jnp.int32)
                t = jnp.full(ps[..., 5:].shape, cn, jnp.float32)
                t = jnp.where(
                    jax.nn.one_hot(tcls, nc, dtype=bool), cp, t)
                cls_bce = bce_logits(ps[..., 5:], t, hyp.cls_pw)
                if hyp.fl_gamma > 0:
                    cls_bce = cls_bce * focal_scale(ps[..., 5:], t, hyp.fl_gamma)
                lcls += _masked_mean(jnp.mean(cls_bce, -1), fg_l)

        lbox *= hyp.box
        lobj *= hyp.obj
        lcls *= hyp.cls
        total = (lbox + lobj + lcls) * bs
        return total, {"box": lbox, "obj": lobj, "cls": lcls}

    return compute_loss
