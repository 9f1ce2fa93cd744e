"""High-level detection pipeline: load -> (fuse) -> jit -> detect.

The detect.py-equivalent engine (reference detect.py:26-296, torch branch)
plus the autoshape-style convenience wrapper (reference common.py:865-932):
arbitrary-size inputs are letterboxed, batched, run through one jitted
forward+NMS program, and outputs scale back to original coordinates.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.data.augment import letterbox
from yolo_series_tpu.eval.evaluator import scale_coords_np
from yolo_series_tpu.models.graph import compile_graph
from yolo_series_tpu.models.model import apply_model, init_model
from yolo_series_tpu.models.reparam import fuse_model
from yolo_series_tpu.ops.nms import batched_nms, nms_output_to_dets


class Detector:
    """One-model inference engine with a fixed (batch, size) compiled once."""

    def __init__(self, plan, params, state, img_size=640,
                 conf_thres=0.25, iou_thres=0.45, max_det=300,
                 classes: Optional[Sequence[int]] = None,
                 agnostic=False, dtype=jnp.bfloat16, augment=False,
                 extra_models=(), fast_stem=True):
        if fast_stem and not augment and not extra_models:
            from yolo_series_tpu.models.faststem import make_fast_stem
            plan, params, state = make_fast_stem(plan, params, state,
                                                 max_pairs=2)
        self.plan = plan
        self.params = params
        self.state = state
        self.img_size = img_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det
        self.classes = tuple(classes) if classes is not None else None
        self.agnostic = agnostic
        self.dtype = dtype
        extra = tuple(extra_models)

        if augment:
            from yolo_series_tpu.models.tta import apply_model_tta

            @jax.jit
            def _run(params, state, x):
                return apply_model_tta(plan, params, state, x, dtype=dtype)
        elif extra:
            # model ensemble: concat predictions pre-NMS
            # (reference Ensemble, experimental.py:69-81)
            @jax.jit
            def _run(params, state, x):
                out, _ = apply_model(plan, params, state, x, training=False,
                                     dtype=dtype)
                preds = [out["pred"]]
                for eplan, ep, es in extra:
                    o2, _ = apply_model(eplan, ep, es, x, training=False,
                                        dtype=dtype)
                    preds.append(o2["pred"])
                return jnp.concatenate(preds, axis=1)
        else:
            @jax.jit
            def _run(params, state, x):
                out, _ = apply_model(plan, params, state, x, training=False,
                                     dtype=dtype)
                return out["pred"]

        self._forward = _run

    @classmethod
    def from_checkpoint(cls, weights, cfg: Optional[str] = None,
                        fuse: bool = True, **kw):
        """Load checkpoint(s) — the attempt_load equivalent
        (experimental.py:247): .ckpt native or reference .pt (torch
        importer); a list of paths builds an Ensemble (experimental.py:69)."""
        from yolo_series_tpu.train.checkpoints import load_checkpoint_any

        paths = [weights] if isinstance(weights, str) else list(weights)
        loaded = []
        for w in paths:
            plan, params, state = load_checkpoint_any(w, cfg)
            if fuse:
                params, state = fuse_model(plan, params, state)
            loaded.append((plan, params, state))
        plan, params, state = loaded[0]
        return cls(plan, params, state, extra_models=loaded[1:], **kw)

    def __call__(self, images) -> List[np.ndarray]:
        """images: one BGR ndarray or a list of them (any sizes).

        Returns per-image (n, 6) [x1, y1, x2, y2, conf, cls] in ORIGINAL
        image coordinates.
        """
        single = isinstance(images, np.ndarray) and images.ndim == 3
        if single:
            images = [images]
        metas = []
        batch = []
        for im0 in images:
            img, ratio, dwdh = letterbox(im0, self.img_size, auto=False)
            batch.append(img[:, :, ::-1])  # BGR->RGB
            metas.append((im0.shape[:2], ((ratio[1], ratio[0]), dwdh)))
        x = jnp.asarray(np.ascontiguousarray(np.stack(batch)),
                        jnp.float32) / 255.0
        pred = self._forward(self.params, self.state, x)
        out = batched_nms(pred, conf_thres=self.conf_thres,
                          iou_thres=self.iou_thres, multi_label=False,
                          agnostic=self.agnostic, max_det=self.max_det,
                          classes=self.classes)
        dets = nms_output_to_dets(out)
        h_in = w_in = self.img_size if isinstance(self.img_size, int) else None
        results = []
        for det, (shape0, ratio_pad) in zip(dets, metas):
            det = det.copy()
            det[:, :4] = scale_coords_np((h_in, w_in), det[:, :4], shape0,
                                         ratio_pad)
            results.append(det)
        return results[0] if single else results

    def predict(self, images, paths=None):
        """Run detection and wrap in a rich Detections object (the
        autoshape+Detections surface, reference common.py:865-1012)."""
        from yolo_series_tpu.infer.results import Detections

        single = isinstance(images, np.ndarray) and images.ndim == 3
        imgs = [images] if single else list(images)
        dets = self(imgs if len(imgs) > 1 else imgs[0])
        if isinstance(dets, np.ndarray):
            dets = [dets]
        return Detections(imgs, dets, names=self.plan.names, paths=paths)


def draw_detections(im0, det, names=(), line_thickness=3):
    """Render detections onto a BGR image (reference detect.py:179-192)."""
    from yolo_series_tpu.obs.plots import color_list, plot_one_box

    colors = color_list()
    for *xyxy, conf, cls in det:
        c = int(cls)
        label = f"{names[c] if c < len(names) else c} {conf:.2f}"
        plot_one_box(xyxy, im0, label=label, color=colors[c % len(colors)],
                     line_thickness=line_thickness)
    return im0
