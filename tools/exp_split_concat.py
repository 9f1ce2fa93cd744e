#!/usr/bin/env python
"""A/B the ELAN concat-elimination rewrite on the real chip.

models/fastconcat.make_split_concat re-expresses conv1x1(concat(xs)) as
per-tap sliced matmuls (exact identity, params untouched), removing the
materialized unaligned concats blamed for the P6 "data formatting"
pathology (PARITY.md: w6 train step ~31% formatting + ~11% pad).

Measures, with the same scan-slope method as bench.py / exp_train_mfu.py:

  train: full SimOTA/aux-OTA train step, with and without the rewrite
  serve: fused end-to-end engine (head+NMS in-graph), with and without

Usage:
  python tools/exp_split_concat.py train --cfg .../yolov7-w6.yaml \
      --batch 4 --size 1280 [--iters 4]
  python tools/exp_split_concat.py serve --cfg .../deploy/yolov7-w6.yaml \
      --batch 8 --size 1280
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from tools.profile_trace import build_serve, build_train  # noqa: E402
from tools.exp_train_mfu import step_slope  # noqa: E402


def measure_train(cfg, batch, size, iters, variant):
    run = build_train(batch, size, cfg=cfg,
                      split_concat=variant == "split",
                      lane_align=variant == "lane")
    step, holder, *args = run.raw
    return step_slope(step, holder["ts"], args, iters)


def measure_serve(cfg, batch, size, iters, variant):
    from yolo_series_tpu.utils.chiprate import chip_rate

    run = build_serve(batch, size, cfg=cfg,
                      split_concat=variant == "split",
                      lane_align=variant == "lane")
    end2end, x, consts = run.raw
    return chip_rate(end2end, x, iters=iters, consts=consts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["train", "serve"])
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--variant", choices=["both", "base", "split", "lane"],
                    default="both",
                    help="run one variant only (large configs OOM the chip "
                         "if base+split train states coexist in one process); "
                         "'lane' = models/lanealign.make_lane_align")
    args = ap.parse_args()

    batch = args.batch or (32 if args.mode == "serve" else 16)
    iters = args.iters or (20 if args.mode == "serve" else 6)
    fn = measure_train if args.mode == "train" else measure_serve

    variants = {"both": ("base", "split"), "base": ("base",),
                "split": ("split",), "lane": ("lane",)}[args.variant]
    out = {"mode": args.mode, "cfg": args.cfg, "batch": batch,
           "size": args.size}
    for key in variants:
        t0 = time.time()
        s = fn(args.cfg, batch, args.size, iters, key)
        out[f"{key}_ms"] = round(s * 1000, 2)
        out[f"{key}_img_s"] = round(batch / s, 1)
        print(f"[{key}] {s * 1000:.2f} ms/batch = {batch / s:.1f} img/s "
              f"(wall {time.time() - t0:.0f}s incl compile)", flush=True)
    if "base_ms" in out and "split_ms" in out:
        out["speedup"] = round(out["base_ms"] / out["split_ms"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
