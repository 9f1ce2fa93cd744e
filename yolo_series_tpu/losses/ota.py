"""ComputeLossOTA — SimOTA dynamic label assignment, batch-vectorized.

The reference implementation (utils/loss.py:556-845) loops over images in
Python, concatenates variable-length candidate lists per level, and runs
topk/argmin on the host per ground truth. Here the entire assignment is a
static-shape computation vmapped over the batch:

  * candidates = every (gt, level, anchor, offset) slot from the
    lateral-offset scheme (losses/targets.py), C = M * nl * na * 5 columns
    with a validity bit — no boolean compression;
  * the (M, C, nc) pairwise classification-cost tensor never materializes:
    for one-hot targets, sum_c BCE(z_c, t_c) = sum_c softplus(z_c) -
    z_{gt_cls}, i.e. one per-candidate reduction + one gather;
  * dynamic-k selection (k = clamp(sum top-K IoU, 1), loss.py:714-715;
    K = 10 for the plain OTA loss, 20 for the aux driver's build_targets,
    loss.py:1498) uses a top-K over the cost row + rank mask — exact;
  * conflict resolution keeps the argmin-cost gt per candidate column
    (loss.py:747-751).

The assignment pieces are exposed (`ota_assign_batch`, `ota_level_loss`)
so the aux coarse-to-fine loss (losses/aux_ota.py) can reuse them with
different offsets / maps.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.losses.targets import find_positive
from yolo_series_tpu.losses.yolo_loss import (
    LossHyp, _masked_mean, balance_for, bce_logits, focal_scale, smooth_bce,
)
from yolo_series_tpu.ops.boxes import bbox_iou, box_iou, xywh2xyxy

K_OFFSETS = 5


def _top_k_iter(x, k):
    """Exact top-k along the last axis via k masked argmax passes.

    lax.top_k lowers to a FULL sort on TPU (~1.9 ms each for the (M, C)
    OTA cost matrices, profiled bs16@640); for k ~ 10-20, k max-reduces
    are several times cheaper. Tie order matches lax.top_k (first index
    wins, argmax semantics)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0])
        idxs.append(i)
        x = jnp.where(iota == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def _assign_single(raw_img: Sequence[jnp.ndarray], labels, label_mask,
                   grids, anchors, strides, hyp: LossHyp, g, topk,
                   codec=None):
    """SimOTA assignment for one image. raw_img: [(na, ny, nx, no)] lead
    maps. Returns (fg (C,), matched_gt (C,)) over the concatenated
    candidate columns (level-major)."""
    # gt pixel scale comes from the ACTUAL traced map shapes (ny*stride ==
    # the runtime image height), exactly like the reference's
    # `this_target[:, 2:6] * imgs[batch_idx].shape[1]` (loss.py:661) —
    # NOT a static config size, so in-graph multi-scale resizes (each a
    # separately compiled program) and quad 2x canvases decode gt at the
    # same scale as the predicted boxes
    img_size = grids[0][0] * float(strides[0])
    m = labels.shape[0]
    nl = len(raw_img)
    na = anchors.shape[1]

    all_ps, all_valid, all_xyxy = [], [], []
    for li in range(nl):
        ny, nx = grids[li]
        c = find_positive(labels[None], label_mask[None], anchors[li],
                          (ny, nx), hyp.anchor_t, g=g)
        gi = c.gi[0].reshape(-1)
        gj = c.gj[0].reshape(-1)
        ai = jax.lax.broadcasted_iota(jnp.int32, (m, na, K_OFFSETS), 1).reshape(-1)
        ps = raw_img[li][ai, gj, gi]
        anc = jnp.broadcast_to(c.anchors[None, :, None, :],
                               (m, na, K_OFFSETS, 2)).reshape(-1, 2)
        grid = jnp.stack([gi, gj], -1).astype(jnp.float32)
        pxy = (jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5 + grid) * strides[li]
        if codec is None:
            pwh = jnp.square(jax.nn.sigmoid(ps[:, 2:4]) * 2.0) * anc * strides[li]
        else:  # e.g. SigmoidBin w/h decode (ComputeLossBinOTA, loss.py:1018)
            pwh = codec["wh_decode"](ps, anc) * strides[li]
        all_xyxy.append(xywh2xyxy(jnp.concatenate([pxy, pwh], -1)))
        all_ps.append(ps)
        all_valid.append(c.valid[0].reshape(-1))

    p_xyxy = jnp.concatenate(all_xyxy, 0)
    p_all = jnp.concatenate(all_ps, 0)
    v_all = jnp.concatenate(all_valid, 0)
    c_total = p_xyxy.shape[0]

    t_xyxy = xywh2xyxy(labels[:, 1:5] * img_size)
    gt_valid = label_mask

    pair_iou = box_iou(t_xyxy, p_xyxy)
    pair_iou = jnp.where(gt_valid[:, None] & v_all[None, :], pair_iou, 0.0)
    iou_cost = -jnp.log(pair_iou + 1e-8)

    topk_eff = min(topk, c_total)
    top_iou = _top_k_iter(pair_iou, topk_eff)[0]
    dyn_k = jnp.clip(jnp.sum(top_iou, -1).astype(jnp.int32), 1, None)

    obj_idx = 4 if codec is None else codec["obj_idx"]
    obj_l = p_all[:, obj_idx:obj_idx + 1]
    cls_l = p_all[:, obj_idx + 1:]
    y = jnp.sqrt(jax.nn.sigmoid(cls_l) * jax.nn.sigmoid(obj_l))
    z = jnp.log(y / (1.0 - y + 1e-12) + 1e-12)
    sp_sum = jnp.sum(jax.nn.softplus(z), axis=-1)
    gt_cls = labels[:, 0].astype(jnp.int32)
    cls_cost = sp_sum[None, :] - z[:, gt_cls].T

    big = 1e8
    cost = cls_cost + 3.0 * iou_cost
    cost = jnp.where(gt_valid[:, None] & v_all[None, :], cost, big)

    neg_top, top_idx = _top_k_iter(-cost, topk_eff)
    rank_ok = (jax.lax.broadcasted_iota(jnp.int32, (m, topk_eff), 1)
               < dyn_k[:, None]) & (-neg_top < big * 0.5)
    matching = jnp.zeros((m, c_total), bool)
    row = jax.lax.broadcasted_iota(jnp.int32, (m, topk_eff), 0)
    matching = matching.at[row, top_idx].set(rank_ok)

    # contested columns are REASSIGNED to the global argmin-cost gt, which
    # may be a gt that never claimed the column (loss.py:752-755 zeroes the
    # whole column then writes cost_argmin unconditionally) — so do not AND
    # with the original claims
    claims = jnp.sum(matching, 0)
    best_gt = jnp.argmin(cost, 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, c_total), 0)
    exclusive = row_ids == best_gt[None, :]
    matching = jnp.where(claims[None, :] > 1, exclusive, matching)

    fg = jnp.any(matching, 0) & v_all
    matched_gt = jnp.argmax(matching, 0)
    return fg, matched_gt


def ota_assign_batch(raw: Sequence[jnp.ndarray], labels, label_mask,
                     anchors: np.ndarray, strides: np.ndarray,
                     hyp: LossHyp, g: float, topk: int,
                     codec=None):
    """Batched assignment. raw: [(B, na, ny, nx, no)] lead maps (fp32).
    Returns fg (B, C), matched_gt (B, C), level column offsets."""
    grids = tuple((r.shape[2], r.shape[3]) for r in raw)

    def wrap(raw_img, labels_i, mask_i):
        return _assign_single(raw_img, labels_i, mask_i, grids, anchors,
                              strides, hyp, g, topk, codec)

    fg, mg = jax.vmap(wrap)(list(raw), labels, label_mask)
    fg = jax.lax.stop_gradient(fg)
    mg = jax.lax.stop_gradient(mg)
    m = labels.shape[1]
    na = anchors.shape[1]
    sizes = [m * na * K_OFFSETS] * len(raw)
    offs = np.cumsum([0] + sizes)
    return fg, mg, offs


def ota_level_loss(pi, labels, label_mask, fg_l, mg_l, anchors_l,
                   hyp: LossHyp, g: float):
    """Box/obj/cls loss terms for one level given assignments.

    pi: (B, na, ny, nx, no) — the maps the loss is APPLIED to (lead or aux;
    the aux branch assigns on lead maps but scores aux maps,
    loss.py:1249-1272). Returns (lbox, obj_bce_mean, lcls).
    """
    bs = pi.shape[0]
    ny, nx = pi.shape[2], pi.shape[3]
    m = labels.shape[1]
    na = anchors_l.shape[0]
    mshape = (bs, m, na, K_OFFSETS)

    cand = find_positive(labels, label_mask, anchors_l, (ny, nx),
                         hyp.anchor_t, g=g)
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
        jnp.asarray(anchors_l)[None, None, :, None, :], mshape + (2,)
    ).reshape(bs, -1, 2)
    pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
    pwh = jnp.square(jax.nn.sigmoid(ps[..., 2:4]) * 2.0) * anc
    pbox = jnp.concatenate([pxy, pwh], -1)
    iou = bbox_iou(pbox, tb, xywh=True, ciou=True)
    lbox = _masked_mean(1.0 - iou, fg_l)

    tobj_val = (1.0 - hyp.gr) + hyp.gr * jax.lax.stop_gradient(jnp.clip(iou, 0.0))
    tobj = jnp.zeros(pi.shape[:4], pi.dtype)
    drop_b = jnp.where(fg_l, bi, bs)
    tobj = tobj.at[drop_b, ai, gj, gi].max(tobj_val, mode="drop")
    obj_bce = bce_logits(pi[..., 4], tobj, hyp.obj_pw)
    if hyp.fl_gamma > 0:
        obj_bce = obj_bce * focal_scale(pi[..., 4], tobj, hyp.fl_gamma)
    lobj = jnp.mean(obj_bce)

    nc = pi.shape[-1] - 5
    if nc > 1:
        cp, cn = smooth_bce(hyp.label_smoothing)
        tcls = labels[bi, mg_l][..., 0].astype(jnp.int32)
        t = jnp.full(ps[..., 5:].shape, cn, jnp.float32)
        t = jnp.where(jax.nn.one_hot(tcls, nc, dtype=bool), cp, t)
        cls_bce = bce_logits(ps[..., 5:], t, hyp.cls_pw)
        if hyp.fl_gamma > 0:
            cls_bce = cls_bce * focal_scale(ps[..., 5:], t, hyp.fl_gamma)
        lcls = _masked_mean(jnp.mean(cls_bce, -1), fg_l)
    else:
        lcls = jnp.float32(0.0)
    return lbox, lobj, lcls


def make_compute_loss_ota(head, hyp: LossHyp,
                          g: float = 0.5, topk: int = 10):
    """Build compute_loss_ota(raw, labels, label_mask) (loss.py:556-845)."""
    nl = len(head.strides)
    balance = balance_for(nl)
    anchors = np.asarray(head.anchors, np.float32).reshape(nl, head.na, 2)
    strides = np.asarray(head.strides, np.float32)

    def compute_loss(raw: Sequence[jnp.ndarray], labels, label_mask):
        raw = [r.astype(jnp.float32) for r in raw[:nl]]
        bs = raw[0].shape[0]
        fg, mg, offs = ota_assign_batch(raw, labels, label_mask, anchors,
                                        strides, hyp, g, topk)
        lbox = lobj = lcls = jnp.float32(0.0)
        for li in range(nl):
            fg_l = fg[:, offs[li]:offs[li + 1]]
            mg_l = mg[:, offs[li]:offs[li + 1]]
            lb, lo, lc = ota_level_loss(raw[li], labels, label_mask, fg_l,
                                        mg_l, anchors[li], hyp, g)
            lbox += lb
            lobj += lo * balance[li]
            lcls += lc
        lbox *= hyp.box
        lobj *= hyp.obj
        lcls *= hyp.cls
        total = (lbox + lobj + lcls) * bs
        return total, {"box": lbox, "obj": lobj, "cls": lcls}

    return compute_loss
