#!/usr/bin/env python
"""INT8 end-to-end accuracy: int8-vs-bf16 mAP on the shapes dataset
(VERDICT r4 next-#3, second half).

The reference's TRT-INT8 path is calibration-accuracy-tested by
construction (README.md:193-228); ours had only tiny-model block-level
closeness (tests/test_infer.py:127). This evaluates a REAL trained
checkpoint three ways on the same val set with the same protocol:

  fp       : fused deploy params, fp32 eval (the mAP ceiling)
  int8     : calibrated per-channel-weight/per-tensor-activation int8
             (infer/quant), XLA conv lowering (YOLO_TPU_PALLAS_INT8=0)
  int8-pal : same quantized tree, 1x1 convs on the Pallas int8 MXU
             kernel (ops/pallas_int8) — must match int8's mAP

Prints ONE JSON line with the three metric rows + deltas.

Usage:
  python tools/eval_int8.py --ckpt runs/acc_compare_s1/ours/weights/last.ckpt \
      --data runs/acc_compare_s1/data [--img-size 320]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

CLASS_NAMES = ["redrect", "greenellipse", "bluetriangle"]


def _metrics(plan, params, state, val_images, img_size, batch_size):
    from yolo_series_tpu.data.datasets import DetectionDataset, create_loader
    from yolo_series_tpu.eval.evaluator import evaluate

    ds = DetectionDataset(val_images, img_size=img_size,
                          batch_size=batch_size, augment=False, rect=True,
                          stride=32, pad=0.5)
    loader = create_loader(ds, batch_size=batch_size, shuffle=False,
                           max_labels=64, drop_last=False)
    r = evaluate(plan, params, state, loader, names=CLASS_NAMES)
    return {k: round(float(r[k]), 4) for k in ("mp", "mr", "map50", "map")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True,
                    help="shapes dataset root (train/ + val/ subdirs)")
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--calib-imgs", type=int, default=8)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from yolo_series_tpu.data.augment import letterbox
    from yolo_series_tpu.infer.quant import calibrate, quantize_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.train.checkpoints import load_checkpoint_any

    data = Path(args.data)
    val_images = str(data / "val" / "images")
    plan, params, state = load_checkpoint_any(args.ckpt)
    params, state = fuse_model(plan, params, state)

    out = {"ckpt": args.ckpt}
    out["fp"] = _metrics(plan, params, state, val_images,
                         args.img_size, args.batch_size)

    # calibration batches: first N train images, letterboxed like serving
    train_imgs = sorted((data / "train" / "images").glob("*.jpg"))
    cal = []
    for p in train_imgs[:args.calib_imgs]:
        im = cv2.imread(str(p))[:, :, ::-1]
        im = letterbox(im, (args.img_size, args.img_size), auto=False)[0]
        cal.append(im[None].astype(np.float32) / 255.0)
    scales = calibrate(plan, params, state, cal)
    qparams, qstate = quantize_model(plan, params, state, scales)
    print(f"calibrated {len(scales)} scales", flush=True)

    os.environ["YOLO_TPU_PALLAS_INT8"] = "0"
    out["int8_xla"] = _metrics(plan, qparams, qstate, val_images,
                               args.img_size, args.batch_size)
    if jax.devices()[0].platform == "tpu":
        os.environ["YOLO_TPU_PALLAS_INT8"] = "1"
        jax.clear_caches()  # force re-trace so the dispatch gate re-reads
        out["int8_pallas"] = _metrics(plan, qparams, qstate, val_images,
                                      args.img_size, args.batch_size)
    out["delta_map50_int8_vs_fp"] = round(
        out["int8_xla"]["map50"] - out["fp"]["map50"], 4)
    out["delta_map_int8_vs_fp"] = round(
        out["int8_xla"]["map"] - out["fp"]["map"], 4)
    if "int8_pallas" in out:
        out["delta_map_pallas_vs_xla_int8"] = round(
            out["int8_pallas"]["map"] - out["int8_xla"]["map"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
