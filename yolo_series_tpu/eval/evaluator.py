"""Evaluation harness — the test.py equivalent (reference test.py:21-288).

Protocol parity: rect dataloader (pad 0.5), conf 0.001 / iou 0.65
multi-label NMS, greedy per-class matching against 10 IoU thresholds
0.5:0.95, ap_per_class + optional COCO-json dump, speed accounting.
Device side (forward + decode + NMS) is one jit; matching and AP run on
host numpy over the accumulated detections.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.eval.metrics import (
    ConfusionMatrix, ap_per_class, fitness, match_predictions,
)
from yolo_series_tpu.models.model import apply_model
from yolo_series_tpu.ops.boxes import xywh2xyxy
from yolo_series_tpu.ops.nms import batched_nms, nms_output_to_dets


def scale_coords_np(img1_shape, coords, img0_shape, ratio_pad=None):
    """Host scale_coords (reference general.py:545-563)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    coords = coords.copy()
    coords[:, [0, 2]] -= pad[0]
    coords[:, [1, 3]] -= pad[1]
    coords[:, :4] /= gain
    coords[:, [0, 2]] = coords[:, [0, 2]].clip(0, img0_shape[1])
    coords[:, [1, 3]] = coords[:, [1, 3]].clip(0, img0_shape[0])
    return coords


def coco80_to_coco91() -> List[int]:
    """80-class contiguous ids -> COCO paper 91-class category ids
    (reference general.py coco80_to_coco91_class, used by test.py:262)."""
    return [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19,
            20, 21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38,
            39, 40, 41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
            56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75,
            76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88, 89, 90]


def evaluate(plan, params, state, loader, *,
             conf_thres: float = 0.001, iou_thres: float = 0.65,
             max_det: int = 300, max_nms: int = 8192,
             compute_dtype=jnp.float32, names=(),
             confusion: bool = False, save_json: Optional[str] = None,
             coco_ids: Optional[List[int]] = None,
             v5_metric: bool = False, verbose: bool = False,
             augment: bool = False, save_txt_dir: Optional[str] = None,
             save_conf: bool = False, save_hybrid: bool = False,
             plots_dir: Optional[str] = None):
    """Run mAP evaluation over a loader of letterboxed batches.

    save_txt_dir writes per-image auto-label txts (normalized xywh in
    native image space, reference test.py:147-153); save_hybrid feeds the
    ground-truth boxes into NMS as conf-1.0 candidates for hybrid
    auto-labelling (test.py:124, general.py:656-662).

    Returns dict with mp, mr, map50, map, per-class ap, speed, fitness.
    """
    nc = plan.nc
    iouv = np.linspace(0.5, 0.95, 10)

    # pixels ship uint8 and normalize on device (4x less H2D than fp32 —
    # same contract as the train step and the serving engine)
    if augment:  # multi-scale + flip TTA (reference test.py --augment)
        from yolo_series_tpu.models.tta import apply_model_tta

        @jax.jit
        def forward(params, state, x):
            # f32 normalize, then apply_model casts — bit-identical to the
            # old host-side f32/255 for every compute_dtype
            return apply_model_tta(plan, params, state,
                                   x.astype(jnp.float32) / 255.0,
                                   dtype=compute_dtype)
    else:
        @jax.jit
        def forward(params, state, x):
            out, _ = apply_model(plan, params, state,
                                 x.astype(jnp.float32) / 255.0,
                                 training=False, dtype=compute_dtype)
            return out["pred"]

    stats = []
    cm = ConfusionMatrix(nc) if confusion else None
    jdict = []
    t_inf = t_nms = 0.0
    seen = 0

    for batch_i, batch in enumerate(loader):
        imgs = batch["images"]
        x = jnp.asarray(imgs)  # uint8; normalized inside the jit
        t0 = time.perf_counter()
        pred = forward(params, state, x)
        # fetch a small slice instead of block_until_ready: the axon relay
        # does not reliably block (CLAUDE.md), so the speed report would
        # otherwise be fiction on tunneled TPUs; bench.py times the same way
        _ = np.asarray(pred[0, :1])
        t1 = time.perf_counter()
        if save_hybrid:
            # hybrid auto-labelling (reference test.py:124 +
            # general.py:656-662): ground truth joins the NMS candidate
            # set as obj-1.0 one-hot rows; padded label slots carry obj 0
            # and fall below conf_thres
            hl, hm = batch["labels"], batch["label_mask"]
            hb, hmax = hl.shape[:2]
            h_b, w_b = imgs.shape[1:3]
            extra = np.zeros((hb, hmax) + (pred.shape[2],), np.float32)
            extra[..., :4] = hl[..., 1:5] * np.array(
                [w_b, h_b, w_b, h_b], np.float32)
            extra[..., 4] = hm.astype(np.float32)
            np.put_along_axis(extra[..., 5:],
                              hl[..., 0].astype(np.int64)[..., None],
                              1.0, axis=-1)
            pred = jnp.concatenate(
                [pred, jnp.asarray(extra, pred.dtype)], axis=1)
        out = batched_nms(pred, conf_thres=conf_thres, iou_thres=iou_thres,
                          multi_label=True, max_det=max_det, max_nms=max_nms)
        dets = nms_output_to_dets(out)
        t2 = time.perf_counter()
        t_inf += t1 - t0
        t_nms += t2 - t1

        h_in, w_in = imgs.shape[1:3]
        labels = batch["labels"]
        mask = batch["label_mask"]

        if plots_dir is not None and batch_i < 3:
            # first-3-batch mosaics (reference test.py:216-222:
            # test_batch{i}_labels.jpg ground truth / _pred.jpg detections)
            from yolo_series_tpu.obs.plots import plot_images
            pl = np.zeros_like(labels)
            pm = np.zeros(labels.shape[:2], bool)
            whwh = np.array([w_in, h_in, w_in, h_in], np.float32)
            for si, d in enumerate(dets):
                n = min(len(d), pl.shape[1])
                if n:
                    xyxy = d[:n, :4] / whwh
                    pl[si, :n, 0] = d[:n, 5]
                    pl[si, :n, 1:3] = (xyxy[:, :2] + xyxy[:, 2:]) / 2
                    pl[si, :n, 3:5] = xyxy[:, 2:] - xyxy[:, :2]
                    pm[si, :n] = True
            pd = Path(plots_dir)
            plot_images(imgs, labels, mask, paths=batch.get("paths"),
                        fname=str(pd / f"test_batch{batch_i}_labels.jpg"),
                        names=names)
            plot_images(imgs, pl, pm, paths=batch.get("paths"),
                        fname=str(pd / f"test_batch{batch_i}_pred.jpg"),
                        names=names)

        for si in range(len(dets)):
            seen += 1
            shapes = batch["shapes"][si]
            lb = labels[si][mask[si]]
            nl = len(lb)
            tcls = lb[:, 0].tolist() if nl else []
            predn = dets[si].copy()
            if shapes is not None:
                (h0, w0), ratio_pad = shapes
                predn[:, :4] = scale_coords_np((h_in, w_in), predn[:, :4],
                                               (h0, w0), ratio_pad)
                native_shape = (h0, w0)
            else:
                native_shape = (h_in, w_in)

            if save_txt_dir is not None:
                # auto-label txt (reference test.py:147-153): one
                # `cls x y w h [conf]` row per det, xywh normalized to the
                # native image
                h0n, w0n = native_shape
                txt = []
                for row in predn:
                    x1, y1, x2, y2 = row[:4]
                    xywh = ((x1 + x2) / 2 / w0n, (y1 + y2) / 2 / h0n,
                            (x2 - x1) / w0n, (y2 - y1) / h0n)
                    vals = ((int(row[5]),) + xywh
                            + ((float(row[4]),) if save_conf else ()))
                    txt.append(" ".join(f"{v:g}" for v in vals))
                if txt:  # the reference creates no file for zero dets
                    out_p = Path(save_txt_dir) / (
                        Path(batch["paths"][si]).stem + ".txt")
                    with open(out_p, "a") as f:
                        f.write("\n".join(txt) + "\n")

            if save_json is not None:
                image_id = Path(batch["paths"][si]).stem
                box = predn[:, :4].copy()
                box[:, 2:] -= box[:, :2]  # xyxy -> xywh corner
                for row, b in zip(predn, box):
                    jdict.append({
                        "image_id": int(image_id) if image_id.isnumeric() else image_id,
                        "category_id": (coco_ids[int(row[5])] if coco_ids
                                        else int(row[5])),
                        "bbox": [round(float(v), 3) for v in b],
                        "score": round(float(row[4]), 5)})

            if nl:
                tbox = np.asarray(
                    xywh2xyxy(lb[:, 1:5] * np.array([w_in, h_in, w_in, h_in],
                                                    np.float32)))
                if shapes is not None:
                    tbox = scale_coords_np((h_in, w_in), tbox, native_shape,
                                           shapes[1])
                labelsn = np.concatenate([lb[:, 0:1], tbox], 1)
                correct = match_predictions(predn, labelsn, iouv)
                if cm is not None:
                    cm.process_batch(predn, labelsn)
            else:
                correct = np.zeros((len(predn), len(iouv)), bool)
            stats.append((correct, predn[:, 4], predn[:, 5], np.array(tcls)))

    if stats:
        tp = np.concatenate([s[0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        pred_cls = np.concatenate([s[2] for s in stats])
        target_cls = np.concatenate([s[3] for s in stats])
    else:
        tp = np.zeros((0, 10), bool)
        conf = pred_cls = target_cls = np.zeros((0,))

    if len(tp) and tp.any():
        p, r, ap, f1, ap_class = ap_per_class(tp, conf, pred_cls, target_cls,
                                              v5_metric=v5_metric, names=names)
        ap50, ap_mean = ap[:, 0], ap.mean(1)
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap_mean.mean()
    else:
        p = r = ap50 = ap_mean = np.zeros(1)
        ap_class = np.zeros(0, np.int32)
        mp = mr = map50 = map_ = 0.0

    if save_json is not None and jdict:
        with open(save_json, "w") as f:
            json.dump(jdict, f)

    results = {
        "mp": float(mp), "mr": float(mr), "map50": float(map50),
        "map": float(map_), "seen": seen,
        "ap_class": ap_class, "ap50": ap50, "ap": ap_mean,
        "speed_ms": {"inference": 1e3 * t_inf / max(seen, 1),
                     "nms": 1e3 * t_nms / max(seen, 1)},
        "fitness": float(fitness(np.array([[mp, mr, map50, map_]]))[0]),
    }
    if verbose and len(ap_class):
        for i, c in enumerate(ap_class):
            name = names[c] if c < len(names) else str(c)
            print(f"{name:>20s} {ap50[i]:.3f} {ap_mean[i]:.3f}")
    if cm is not None:
        results["confusion"] = cm
    return results
