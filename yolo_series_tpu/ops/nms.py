"""On-TPU batched non-maximum suppression — fixed shapes, no host round trip.

Replaces the reference's CUDA NMS (`torchvision.ops.nms` via
utils/general.py:628-720 `non_max_suppression`) and the TensorRT
`EfficientNMS_TRT` plugin (utils/add_nms.py:72-143, models/experimental.py:111).

Design (TPU-first):
  * Candidate selection is a single `lax.top_k` over (anchors x classes)
    scores — the reference's boolean-mask + sort (general.py:661-697)
    becomes a static-shape top-K, so the whole path jits once.
  * Suppression is *exact greedy NMS* computed tile-by-tile: boxes sorted by
    score are processed in tiles of T; each tile is suppressed against all
    previously-resolved tiles with one (K, T) IoU product, then resolved
    internally by a fixed-point "self-suppression" iteration (the classic
    TPU formulation used by TF's padded NMS). Sequential depth is K/T outer
    steps + a handful of inner iterations, instead of K data-dependent steps.
  * Output is the EfficientNMS-style contract: (num_dets, boxes, scores,
    classes) with static max_det rows — identical to the Triton client's
    response contract (deploy/triton-inference-server/client.py:15-16).

Class-offset trick (general.py:702-703) is preserved: per-class NMS is done
by shifting boxes by `class_id * max_wh` so one suppression pass handles all
classes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from yolo_series_tpu.ops.boxes import box_iou, xywh2xyxy


class NMSOutput(NamedTuple):
    """EfficientNMS_TRT-style fixed-shape detections (batched)."""

    num_dets: jnp.ndarray  # (B,) int32 — valid rows per image
    boxes: jnp.ndarray     # (B, max_det, 4) xyxy
    scores: jnp.ndarray    # (B, max_det)
    classes: jnp.ndarray   # (B, max_det) int32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def nms_keep_mask_full(boxes: jnp.ndarray, iou_threshold: float,
                       max_iters: Optional[int] = None) -> jnp.ndarray:
    """Exact greedy NMS keep-mask via whole-matrix fixed-point iteration.

    One (K, K) IoU product + a short convergence loop (alive_{t+1}[p] =
    ~exists alive_t[q], q<p, IoU(q,p)>thr) — the same self-suppression map
    as the tiled kernel but with no outer tiling, which wins for the K <=
    ~1024 candidate counts of the serving path (fewer sequential steps,
    better VPU utilization under vmap).
    """
    k = boxes.shape[0]
    if max_iters is None:
        # a suppression chain can be up to k deep; the while_loop exits
        # early on convergence, so the bound costs nothing when shallow
        max_iters = k
    iou = box_iou(boxes, boxes)
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    m = (iou > iou_threshold) & (rows < cols)  # m[q, p]: q can suppress p
    alive0 = jnp.ones((k,), bool)

    def step(alive):
        return ~jnp.any(alive[:, None] & m, axis=0)

    def cond(state):
        alive, prev, it = state
        return jnp.any(alive != prev) & (it < max_iters)

    def body(state):
        alive, _, it = state
        return step(alive), alive, it + 1

    alive, _, _ = jax.lax.while_loop(cond, body, (step(alive0), alive0,
                                                  jnp.int32(0)))
    return alive


def nms_keep_mask(boxes: jnp.ndarray, iou_threshold: float, tile: int = 256) -> jnp.ndarray:
    """Exact greedy NMS keep-mask for score-sorted boxes.

    Args:
      boxes: (K, 4) xyxy, already sorted by descending score. Padding rows
        must be all-zero (zero area => IoU 0 => inert).
      iou_threshold: suppress j>i when IoU(i, j) > threshold and i is kept.
      tile: tile size (sequential depth is K / tile).

    Returns:
      (K,) bool keep mask equal to sequential greedy NMS.
    """
    k = boxes.shape[0]
    kp = _round_up(k, tile)
    if kp != k:
        boxes = jnp.pad(boxes, ((0, kp - k), (0, 0)))
    num_tiles = kp // tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    strict_lower = row_ids < col_ids  # suppressor index < suppressee index
    all_ids = jax.lax.broadcasted_iota(jnp.int32, (kp, 1), 0)[:, 0]

    def outer(i, keep):
        start = i * tile
        row = jax.lax.dynamic_slice(boxes, (start, 0), (tile, 4))
        # Suppression by alive boxes in previously-resolved tiles.
        iou_prev = box_iou(boxes, row)  # (kp, tile)
        prev_alive = keep & (all_ids < start)
        dead0 = jnp.any((iou_prev > iou_threshold) & prev_alive[:, None], axis=0)
        alive0 = ~dead0
        # Within-tile fixed-point self-suppression (exact greedy).
        m = (box_iou(row, row) > iou_threshold) & strict_lower  # m[q, p]: q can suppress p

        def step(alive):
            return alive0 & ~jnp.any(alive[:, None] & m, axis=0)

        def cond(state):
            alive, prev, it = state
            return jnp.any(alive != prev) & (it < tile)

        def body(state):
            alive, _, it = state
            return step(alive), alive, it + 1

        alive, _, _ = jax.lax.while_loop(
            cond, body, (step(alive0), alive0, jnp.int32(0))
        )
        return jax.lax.dynamic_update_slice(keep, alive, (start,))

    keep = jax.lax.fori_loop(0, num_tiles, outer, jnp.ones((kp,), dtype=bool))
    return keep[:k]


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    max_output: int = 300,
    tile: int = 256,
):
    """Single-image NMS with padded static-shape output.

    Args:
      boxes: (N, 4) xyxy (need not be sorted).
      scores: (N,) — rows with score == -inf are treated as invalid padding.
      max_output: static number of output slots.

    Returns:
      (indices, valid): (max_output,) int32 indices into the input (0-filled
      past `valid`), and scalar int32 count.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    valid_in = jnp.isfinite(scores_s)
    boxes_s = jnp.where(valid_in[:, None], boxes_s, 0.0)
    keep = nms_keep_mask(boxes_s, iou_threshold, tile=tile) & valid_in
    pos = jnp.cumsum(keep) - 1
    writable = keep & (pos < max_output)
    out_idx = jnp.zeros((max_output,), dtype=jnp.int32)
    out_idx = out_idx.at[jnp.where(writable, pos, max_output)].set(
        order.astype(jnp.int32), mode="drop"
    )
    valid = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_output)
    return out_idx, valid


def _single_image_nms(
    pred: jnp.ndarray,
    conf_thres: float,
    iou_thres: float,
    multi_label: bool,
    agnostic: bool,
    max_det: int,
    max_nms: int,
    max_wh: float,
    nc: int,
    tile: int,
    class_mask: Optional[jnp.ndarray],
    score_dtype=jnp.float32,
):
    """pred: (A, 5 + nc) decoded predictions for one image.

    score_dtype=bfloat16 halves the bandwidth of the (A, nc) scoring pass —
    the serving default; box coordinates always stay fp32.
    """
    obj = pred[:, 4].astype(score_dtype)
    cls_scores = pred[:, 5:5 + nc].astype(score_dtype) * obj[:, None]

    if multi_label:
        # Every (anchor, class) pair is a candidate — reference general.py:684.
        flat = cls_scores.reshape(-1).astype(jnp.float32)
        if class_mask is not None:
            flat = jnp.where(jnp.tile(class_mask, (pred.shape[0],)), flat, -jnp.inf)
        flat = jnp.where(flat > conf_thres, flat, -jnp.inf)
        k = min(max_nms, flat.shape[0])
        top_scores, top_flat_idx = jax.lax.top_k(flat, k)
        anchor_idx = top_flat_idx // nc
        cand_cls = (top_flat_idx % nc).astype(jnp.float32)
    else:
        # Best class per anchor — reference general.py:687-688.
        if class_mask is not None:
            cls_scores = jnp.where(class_mask[None, :], cls_scores, -jnp.inf)
        best = jnp.argmax(cls_scores, axis=-1)
        score = jnp.max(cls_scores, axis=-1).astype(jnp.float32)
        # the (A,) score vector is tiny — select in fp32 (bf16 top_k is slow)
        score = jnp.where(score > conf_thres, score, -jnp.inf)
        k = min(max_nms, score.shape[0])
        top_scores, anchor_idx = jax.lax.top_k(score, k)
        cand_cls = best[anchor_idx].astype(jnp.float32)
    top_scores = top_scores.astype(jnp.float32)
    # convert only the selected candidates (k rows, not all A anchors)
    cand_boxes = xywh2xyxy(pred[anchor_idx, 0:4])
    return _nms_tail(cand_boxes, top_scores, cand_cls, iou_thres, agnostic,
                     max_det, max_wh, tile)


def _nms_tail(cand_boxes, top_scores, cand_cls, iou_thres, agnostic,
              max_det, max_wh, tile, payload=None):
    """Greedy suppression + packed output from score-sorted candidates.
    cand_boxes (K, 4) xyxy fp32, top_scores (K,) fp32 (-inf = invalid),
    cand_cls (K,) fp32; payload (K, P) optional extra columns (keypoints)
    carried through the same scatter."""
    valid_cand = jnp.isfinite(top_scores)
    offset = 0.0 if agnostic else cand_cls * max_wh
    nms_boxes = jnp.where(valid_cand[:, None], cand_boxes + offset[:, None], 0.0)
    if nms_boxes.shape[0] <= 1024:  # serving path: whole-matrix fixed point
        keep = nms_keep_mask_full(nms_boxes, iou_thres) & valid_cand
    else:                           # eval path (large K): tiled kernel
        keep = nms_keep_mask(nms_boxes, iou_thres, tile=tile) & valid_cand

    pos = jnp.cumsum(keep) - 1
    writable = keep & (pos < max_det)
    scatter_idx = jnp.where(writable, pos, max_det)
    out_boxes = jnp.zeros((max_det, 4), jnp.float32).at[scatter_idx].set(
        cand_boxes, mode="drop")
    out_scores = jnp.zeros((max_det,), jnp.float32).at[scatter_idx].set(
        top_scores, mode="drop")
    out_classes = jnp.zeros((max_det,), jnp.int32).at[scatter_idx].set(
        cand_cls.astype(jnp.int32), mode="drop")
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_det)
    if payload is not None:
        out_payload = jnp.zeros((max_det, payload.shape[-1]),
                                jnp.float32).at[scatter_idx].set(
            payload.astype(jnp.float32), mode="drop")
        return num, out_boxes, out_scores, out_classes, out_payload
    return num, out_boxes, out_scores, out_classes


@functools.partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "multi_label", "agnostic",
        "max_det", "max_nms", "max_wh", "tile", "score_dtype",
    ),
)
def batched_nms(
    pred: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    multi_label: bool = False,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms: int = 4096,
    max_wh: float = 4096.0,
    tile: int = 256,
    classes: Optional[Sequence[int]] = None,
    score_dtype=jnp.float32,
) -> NMSOutput:
    """Batched end-to-end NMS on decoded predictions.

    Functional equivalent of reference utils/general.py:628 `non_max_suppression`
    with static shapes: pred (B, A, 5+nc) in xywh+obj+cls layout.

    `classes` restricts detections to the given class ids (reference
    general.py:691-693).
    """
    nc = pred.shape[-1] - 5
    class_mask = None
    if classes is not None:
        class_mask = jnp.zeros((nc,), dtype=bool).at[jnp.asarray(list(classes))].set(True)
    fn = functools.partial(
        _single_image_nms,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        multi_label=multi_label,
        agnostic=agnostic,
        max_det=max_det,
        max_nms=max_nms,
        max_wh=max_wh,
        nc=nc,
        tile=tile,
        class_mask=class_mask,
        score_dtype=score_dtype,
    )
    num, boxes, scores, cls = jax.vmap(fn)(pred.astype(jnp.float32))
    return NMSOutput(num, boxes, scores, cls)


def nms_output_to_dets(out: NMSOutput):
    """NMSOutput -> list of (n_i, 6) numpy arrays [x1, y1, x2, y2, conf, cls].

    Host-side convenience matching the reference torch-path detection rows
    (detect.py:152, test.py:126).
    """
    import numpy as np

    num = np.asarray(out.num_dets)
    boxes = np.asarray(out.boxes)
    scores = np.asarray(out.scores)
    classes = np.asarray(out.classes)
    dets = []
    for i in range(num.shape[0]):
        n = int(num[i])
        dets.append(
            np.concatenate(
                [boxes[i, :n], scores[i, :n, None], classes[i, :n, None].astype(np.float32)],
                axis=1,
            )
        )
    return dets


def fused_head_nms(head, head_params, feats, *, conf_thres=0.25,
                   iou_thres=0.45, max_det=300, max_nms=256,
                   max_wh=4096.0, compute_dtype=jnp.bfloat16):
    """Serving fast path: head convs + candidate top-k + decode-of-selected
    + NMS, WITHOUT materializing the (B, A, no) decoded tensor.

    The standard path (heads._decode_level -> _single_image_nms) sigmoids
    and transposes the full per-level maps (fp32, anchor-major relayout)
    before NMS throws 99% of rows away; here scores are reduced directly
    from the conv output layout, only the top `max_nms` candidates are
    gathered and decoded. Same contract as the EfficientNMS outputs
    (num, boxes, scores, classes) and numerically equivalent to the
    standard path up to fp associativity (best-class selection via the
    monotone sigmoid). multi_label=False semantics (serving default,
    general.py:687-688).

    head: Detect-family (fused: plain conv per level); feats: per-level
    (B, ny, nx, c) backbone outputs; head_params: head param dict with
    "m" conv list.
    """
    import numpy as np

    from yolo_series_tpu.models.layers import Ctx

    nc, na, nl = head.nc, head.na, head.nl
    no = head.no
    apx = head.anchors_grid()  # (nl, na, 2) pixel anchors
    strides = head.strides
    assert len(feats) >= nl, (len(feats), nl)

    convs = head._convs()
    raw_levels = []
    dims = []
    for i in range(nl):
        y, _ = convs[i].apply(head_params["m"][i], {}, feats[i],
                              Ctx(dtype=compute_dtype))
        b, ny, nx, _ = y.shape
        raw_levels.append(y.reshape(b, ny * nx * na, no))  # free reshape
        dims.append((ny, nx))
    offs = np.cumsum([0] + [r.shape[1] for r in raw_levels])

    def one(rows_per_level):
        # rows_per_level: [(A_l, no)] raw logits for one image
        scores = []
        for r in rows_per_level:
            rf = r.astype(jnp.float32)
            obj = jax.nn.sigmoid(rf[:, 4])
            cls_best = jax.nn.sigmoid(jnp.max(rf[:, 5:5 + nc], axis=-1))
            scores.append(obj * cls_best)
        score = jnp.concatenate(scores)
        score = jnp.where(score > conf_thres, score, -jnp.inf)
        k = min(max_nms, score.shape[0])
        top_scores, flat_idx = jax.lax.top_k(score, k)

        # gather the k raw rows + their geometry, level by level
        rows = jnp.zeros((k, no), jnp.float32)
        grid = jnp.zeros((k, 2), jnp.float32)
        anc = jnp.zeros((k, 2), jnp.float32)
        strd = jnp.zeros((k,), jnp.float32)
        for li in range(nl):
            ny, nx = dims[li]
            n_l = ny * nx * na
            in_level = (flat_idx >= offs[li]) & (flat_idx < offs[li + 1])
            idx_l = jnp.clip(flat_idx - offs[li], 0, n_l - 1)
            r_l = rows_per_level[li][idx_l].astype(jnp.float32)
            cell = idx_l // na
            a_l = idx_l % na
            gx = (cell % nx).astype(jnp.float32)
            gy = (cell // nx).astype(jnp.float32)
            g_l = jnp.stack([gx, gy], -1)
            anc_l = jnp.asarray(apx[li], jnp.float32)[a_l]
            rows = jnp.where(in_level[:, None], r_l, rows)
            grid = jnp.where(in_level[:, None], g_l, grid)
            anc = jnp.where(in_level[:, None], anc_l, anc)
            strd = jnp.where(in_level, jnp.float32(strides[li]), strd)

        # decode ONLY the selected candidates (yolo.py:55-57 math)
        sig = jax.nn.sigmoid(rows[:, 0:4])
        xy = (sig[:, 0:2] * 2.0 - 0.5 + grid) * strd[:, None]
        wh = jnp.square(sig[:, 2:4] * 2.0) * anc
        cand_boxes = xywh2xyxy(jnp.concatenate([xy, wh], -1))
        cand_cls = jnp.argmax(rows[:, 5:5 + nc], axis=-1).astype(jnp.float32)
        return _nms_tail(cand_boxes, top_scores, cand_cls, iou_thres,
                         False, max_det, max_wh, 256)

    return jax.vmap(one)(raw_levels)


def batched_nms_kpt(pred: jnp.ndarray, conf_thres: float = 0.25,
                    iou_thres: float = 0.45, max_det: int = 300,
                    max_nms: int = 256, max_wh: float = 4096.0,
                    agnostic: bool = False):
    """Keypoint-aware NMS (reference non_max_suppression_kpt,
    general.py:723-780, kpt_label=True): pred is the IKeypoint decoded
    output (B, A, 6 + 3*nkpt) = [xywh, obj, cls1, kpts...] with obj/cls
    already sigmoided; score = obj * cls. Returns
    (num (B,), boxes (B, max_det, 4) xyxy, scores, classes, kpts
    (B, max_det, 3*nkpt)) — static shapes, fully on-device.
    """
    def one(p):
        score = (p[:, 4] * p[:, 5]).astype(jnp.float32)
        score = jnp.where(score > conf_thres, score, -jnp.inf)
        k = min(max_nms, score.shape[0])
        top_scores, idx = jax.lax.top_k(score, k)
        cand_boxes = xywh2xyxy(p[idx, 0:4].astype(jnp.float32))
        cand_cls = jnp.zeros((k,), jnp.float32)  # single-class pose head
        return _nms_tail(cand_boxes, top_scores, cand_cls, iou_thres,
                         agnostic, max_det, max_wh, 256, payload=p[idx, 6:])

    return jax.vmap(one)(pred)
