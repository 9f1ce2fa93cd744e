"""Export CLI — the deploy pipeline (export_onnx.py equivalent).

The reference exports ONNX and hands off to TensorRT (export_onnx.py,
README.md:192-228). TPU-native deployment needs no foreign IR: export =
re-parameterize (fuse) -> optional INT8 quantization -> save a deploy
checkpoint, and optionally serialize the AOT end-to-end program
(forward + decode + NMS) as StableHLO via jax.export for serving hosts.

python -m yolo_series_tpu.cli.export --weights last.ckpt \
    --int8 --batch-size 8 --img-size 640 --stablehlo engine.mlir
"""

from __future__ import annotations

import argparse
import pickle
import time
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser("yolo-series-tpu export")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--calib-images", type=str, default=None,
                   help="dir of images for INT8 calibration")
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=100)
    p.add_argument("--stablehlo", type=str, default=None,
                   help="serialize the AOT end2end program to this path")
    p.add_argument("--bench", action="store_true",
                   help="measure serving throughput/latency after export")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp

    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.train.checkpoints import load_checkpoint_any
    from yolo_series_tpu.infer.serving import ServingEngine

    plan, params, state = load_checkpoint_any(opt.weights, opt.cfg)
    params, state = fuse_model(plan, params, state)
    print("fused model (Conv+BN, RepConv, implicit folded)")

    if opt.int8:
        from yolo_series_tpu.infer.quant import calibrate, quantize_model
        act_scales = None
        if opt.calib_images:
            import cv2
            from yolo_series_tpu.data.augment import letterbox
            from yolo_series_tpu.infer.sources import LoadImages
            imgs = []
            for path, img, *_ in LoadImages(opt.calib_images,
                                            img_size=opt.img_size):
                imgs.append(img.astype(np.float32)[None] / 255.0)
                if len(imgs) >= 16:
                    break
            act_scales = calibrate(plan, params, state, imgs)
            print(f"calibrated {len(act_scales)} activation scales")
        params, state = quantize_model(plan, params, state, act_scales)
        print("quantized conv weights to int8")

    out_path = opt.output or (Path(opt.weights).with_suffix("").as_posix()
                              + (".int8" if opt.int8 else ".deploy") + ".ckpt")
    import yaml as _yaml
    cfg_dict = (_yaml.safe_load(open(opt.cfg)) if opt.cfg else None)
    blob = {
        "format": "yolo-series-tpu-ckpt-v1", "epoch": -1, "best_fitness": 0,
        "results": None, "hyp": None, "cfg": cfg_dict, "step": 0,
        "params": jax.tree_util.tree_map(np.asarray, params),
        "state": jax.tree_util.tree_map(np.asarray, state),
        "ema_params": None, "ema_state": None, "opt_state": None,
    }
    if cfg_dict is None:  # carry cfg from the source checkpoint
        from yolo_series_tpu.train.checkpoints import load_checkpoint
        try:
            blob["cfg"] = load_checkpoint(opt.weights)["cfg"]
        except Exception:
            pass
    with open(out_path, "wb") as f:
        pickle.dump(blob, f, protocol=4)
    print(f"deploy checkpoint -> {out_path}")

    if opt.stablehlo or opt.bench:
        engine = ServingEngine(plan, params, state,
                               batch_size=opt.batch_size,
                               img_size=opt.img_size,
                               conf_thres=opt.conf_thres,
                               iou_thres=opt.iou_thres, max_det=opt.max_det)
        if opt.stablehlo:
            from jax import export as jexport
            from yolo_series_tpu.models.model import apply_model

            def fn(x):
                out, _ = apply_model(plan, params, state,
                                     x.astype(jnp.bfloat16) / 255.0,
                                     training=False, dtype=jnp.bfloat16)
                return out["pred"]

            exp = jexport.export(jax.jit(fn))(
                jax.ShapeDtypeStruct(
                    (opt.batch_size, opt.img_size, opt.img_size, 3), jnp.uint8))
            Path(opt.stablehlo).write_bytes(exp.serialize())
            print(f"stablehlo program -> {opt.stablehlo}")
        if opt.bench:
            engine.warmup()
            x = np.random.randint(0, 255, (opt.batch_size, opt.img_size,
                                           opt.img_size, 3), np.uint8)
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                engine.infer(x)
            dt = (time.perf_counter() - t0) / n
            print(f"serving: {opt.batch_size / dt:.1f} img/s, "
                  f"{dt * 1e3:.2f} ms/batch-{opt.batch_size}")


if __name__ == "__main__":
    main()
