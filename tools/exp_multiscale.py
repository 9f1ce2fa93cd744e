#!/usr/bin/env python
"""Multi-scale bucketing A/B (VERDICT r4 next-#5).

The reference redraws a random stride-multiple train size in
[0.5, 1.5]·imgsz every 10 integrated batches (train.py:360-365); this
framework ships 5 fixed gs-rounded buckets redrawn every optimizer step
so XLA compiles <= 5 step programs. Does the bucketing move final mAP?

Trains the SAME shapes dataset (tools/train_accuracy_compare.make_dataset)
twice with OUR trainer — identical seeds/hyp/epochs, multi-scale on:

  bucket : shipped default (5 buckets, redraw each step)
  refdist: multi_scale_full_range + multi_scale_every=10 — the
           reference's distribution (any gs multiple, sticky for 10
           steps), one compiled program per size

then evaluates both final checkpoints with eval/evaluator.evaluate and
prints ONE JSON line with the mAP delta. Device-agnostic: runs on the
TPU when available (both variants on the same device — the comparison
is ours-vs-ours).

Usage: python tools/exp_multiscale.py --out runs/ms_ab [--epochs 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402
import yaml  # noqa: E402

from tools.train_accuracy_compare import (CLASS_NAMES, make_dataset,  # noqa: E402
                                          make_hyp)


def run_variant(name, data_yaml, hyp_yaml, out, args, **tc_kw):
    import jax.numpy as jnp

    from yolo_series_tpu.train.trainer import TrainConfig, train

    tc = TrainConfig(
        cfg="yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
        data=str(data_yaml), hyp=str(hyp_yaml), epochs=args.epochs,
        batch_size=args.batch_size, img_size=args.img_size,
        save_dir=str(out / name), compute_dtype=jnp.bfloat16,
        max_labels=64, noval=True, save_period=-1, autoanchor=False,
        nominal_batch_size=64, workers=1, seed=0, multi_scale=True,
        # nosave: per-epoch last.ckpt saves fetch the full train state
        # through the TPU relay (~60 s/epoch on this box — 10x the step
        # loop); the A/B only evaluates the FINAL checkpoint, which the
        # trainer writes regardless on the last epoch
        nosave=True,
        **tc_kw)
    t0 = time.time()
    train(tc)
    return {"wall_s": round(time.time() - t0, 1),
            "ckpt": str(out / name / "weights" / "last.ckpt")}


def eval_ckpt(ckpt, val_images, args):
    from yolo_series_tpu.data.datasets import DetectionDataset, create_loader
    from yolo_series_tpu.eval.evaluator import evaluate
    from yolo_series_tpu.train.checkpoints import load_checkpoint_any

    plan, params, state = load_checkpoint_any(ckpt)
    ds = DetectionDataset(val_images, img_size=args.img_size,
                          batch_size=args.batch_size, augment=False,
                          rect=True, stride=32, pad=0.5)
    loader = create_loader(ds, batch_size=args.batch_size, shuffle=False,
                           max_labels=64, drop_last=False)
    r = evaluate(plan, params, state, loader, names=CLASS_NAMES)
    return {k: float(r[k]) for k in ("mp", "mr", "map50", "map")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/ms_ab")
    ap.add_argument("--train-imgs", type=int, default=160)
    ap.add_argument("--val-imgs", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--variant", default="both",
                    choices=["both", "bucket", "refdist"])
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data_root = out / "data"
    data_yaml = out / "data.yaml"
    hyp_yaml = out / "hyp.yaml"
    if not data_yaml.exists():
        make_dataset(data_root / "train", args.train_imgs, seed=1234)
        make_dataset(data_root / "val", args.val_imgs, seed=9876)
        data_yaml.write_text(yaml.dump({
            "train": str(data_root / "train" / "images"),
            "val": str(data_root / "val" / "images"),
            "nc": 3, "names": CLASS_NAMES}))
        make_hyp(hyp_yaml)

    state_path = out / "ms_ab.json"
    st = json.loads(state_path.read_text()) if state_path.exists() else {}
    variants = {
        "bucket": {},
        "refdist": {"multi_scale_full_range": True, "multi_scale_every": 10},
    }
    for name, kw in variants.items():
        if args.variant not in ("both", name):
            continue
        print(f"[{name}] training ...", flush=True)
        st[name] = run_variant(name, data_yaml, hyp_yaml, out, args, **kw)
        state_path.write_text(json.dumps(st, indent=1))
        print(f"[{name}] done in {st[name]['wall_s']}s", flush=True)

    if all(n in st for n in variants):
        val_images = str(data_root / "val" / "images")
        for name in variants:
            st[name]["metrics"] = eval_ckpt(st[name]["ckpt"], val_images,
                                            args)
        st["delta_map50"] = round(st["bucket"]["metrics"]["map50"]
                                  - st["refdist"]["metrics"]["map50"], 4)
        st["delta_map"] = round(st["bucket"]["metrics"]["map"]
                                - st["refdist"]["metrics"]["map"], 4)
        state_path.write_text(json.dumps(st, indent=1))
        print(json.dumps({k: st[k] for k in
                          ("delta_map50", "delta_map")} |
                         {n: st[n]["metrics"] for n in variants}))


if __name__ == "__main__":
    main()
