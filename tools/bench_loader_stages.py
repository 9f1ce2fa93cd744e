"""Per-stage input-pipeline cost model (VERDICT r3 item 7).

Replaces PARITY.md's extrapolated "~200 img/s on 8 cores" with MEASURED
per-stage costs and an explicit scaling model:

  stage costs (this host, single thread):
    decode        cv2.imread of a photo-like JPEG            [per image]
    load_image    decode + aspect-preserving resize          [per image]
    mosaic4       compose 4 cached decoded tiles + labels    [per sample]
    warp          random_perspective (shipped default hyps)  [per sample]
    hsv           one-LUT HSV jitter                         [per sample]
    flips+xywh    flips + label convert                      [per sample]
    collate       pad_labels + batch stack                   [per image]

  projection:  per_worker_img_s = 1000 / per_image_ms
               W workers ~= W x per_worker (cv2/numpy release the GIL;
               validated here only insofar as a 1-core box allows:
               workers=2 must not REGRESS vs workers=1)

  whole-loader cross-checks on the same dataset:
    loader(workers=1)                 full path
    loader(cache_images=True)         decode removed -> aug-only cost
    loader(workers=2)                 no-regression check (1 core)

Usage: python tools/bench_loader_stages.py [--n 96] [--img 640]
Appends one JSON document to LOADER_STAGES.json and prints the table.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bench_loader import make_synthetic_dataset  # noqa: E402


def timeit(fn, iters, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def stage_costs(paths, img_size, iters=40):
    import cv2

    from yolo_series_tpu.data.augment import (augment_hsv, mosaic4,
                                              random_perspective)

    rng = np.random.default_rng(0)
    out = {}
    p0 = paths[0]
    out["decode_ms"] = timeit(lambda: cv2.imread(p0), iters)

    def _load_resized(p):
        im = cv2.imread(p)
        h, w = im.shape[:2]
        r = img_size / max(h, w)
        if r != 1:
            im = cv2.resize(im, (int(w * r), int(h * r)),
                            interpolation=cv2.INTER_AREA)
        return im

    out["load_image_ms"] = timeit(lambda: _load_resized(p0), iters)

    tiles = [_load_resized(p) for p in paths[:4]]
    lbls = []
    for t in tiles:  # (cls, x1, y1, x2, y2) pixel coords in the tile
        h, w = t.shape[:2]
        xy = rng.uniform(0.2, 0.5, (6, 2)) * (w, h)
        wh = rng.uniform(0.1, 0.4, (6, 2)) * (w, h)
        lbls.append(np.concatenate(
            [np.zeros((6, 1)), xy, xy + wh], 1).astype(np.float32))
    hyp_like = dict(degrees=0.0, translate=0.2, scale=0.9, shear=0.0,
                    perspective=0.0)

    def _mosaic():
        return mosaic4(tiles, lbls, img_size, rng=rng)

    out["mosaic4_compose_ms"] = timeit(_mosaic, iters)

    big, big_l = _mosaic()

    def _warp():
        return random_perspective(big.copy(), big_l.copy(),
                                  border=(-img_size // 2, -img_size // 2),
                                  **hyp_like)

    out["warp_ms"] = timeit(_warp, max(iters // 2, 10))
    warped, _ = _warp()

    out["hsv_ms"] = timeit(
        lambda: augment_hsv(warped.copy(), 0.015, 0.7, 0.4, rng=rng),
        iters)
    out["flip_label_ms"] = timeit(
        lambda: (np.ascontiguousarray(warped[:, ::-1]),), iters)

    from yolo_series_tpu.data.datasets import pad_labels
    lb = [rng.uniform(0, 1, (40, 5)).astype(np.float32)]
    out["collate_pad_ms"] = timeit(lambda: pad_labels(lb, 256), iters * 4)
    return out


def loader_rate(root, img_size, bs, *, workers, cache_images,
                epochs=2):
    from yolo_series_tpu.data.datasets import DetectionDataset, create_loader

    hyp = {"mosaic": 1.0, "mixup": 0.0, "paste_in": 0.0,
           "degrees": 0.0, "shear": 0.0, "perspective": 0.0,
           "translate": 0.2, "scale": 0.9}
    ds = DetectionDataset(str(root / "images"), img_size=img_size,
                          batch_size=bs, augment=True, hyp=hyp,
                          cache_images=cache_images)
    loader = create_loader(ds, batch_size=bs, max_labels=64, seed=0,
                           workers=workers)
    n = 0
    best = 0.0
    for ep in range(epochs):  # epoch 0 warms caches/pools; keep the best
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            n += batch["images"].shape[0]
        rate = n / (time.perf_counter() - t0)
        best = max(best, rate)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--src-hw", default="480,640",
                    help="source JPEG size (480,640 ~ COCO; 1500,2000 ~ "
                         "CrowdHuman)")
    ap.add_argument("--out", default=str(REPO / "LOADER_STAGES.json"))
    args = ap.parse_args()

    hw = tuple(int(v) for v in args.src_hw.split(","))
    tmp = Path(tempfile.mkdtemp())
    paths = make_synthetic_dataset(tmp, args.n, hw=hw)

    stages = stage_costs(paths, args.img)
    # per-sample model: mosaic draws 4 decodes + compose, then warp/hsv/flip
    per_img_ms = (4 * stages["load_image_ms"]
                  + stages["mosaic4_compose_ms"] + stages["warp_ms"]
                  + stages["hsv_ms"] + stages["flip_label_ms"]
                  + stages["collate_pad_ms"])
    per_img_cached_ms = per_img_ms - 4 * stages["load_image_ms"]

    rates = {
        "loader_w1": loader_rate(tmp, args.img, args.bs, workers=1,
                                 cache_images=False),
        "loader_w1_cached": loader_rate(tmp, args.img, args.bs, workers=1,
                                        cache_images=True),
        "loader_w2_one_core": loader_rate(tmp, args.img, args.bs, workers=2,
                                          cache_images=False),
    }

    record = {
        "date": time.strftime("%Y-%m-%d"),
        "src_hw": hw, "img": args.img, "bs": args.bs, "n": args.n,
        "stages_ms": {k: round(v, 3) for k, v in stages.items()},
        "model_per_img_ms": round(per_img_ms, 2),
        "model_per_worker_img_s": round(1000.0 / per_img_ms, 1),
        "model_per_worker_cached_img_s": round(1000.0 / per_img_cached_ms, 1),
        "model_8_workers_img_s": round(8 * 1000.0 / per_img_ms, 1),
        "measured_img_s": {k: round(v, 1) for k, v in rates.items()},
        "model_vs_measured_w1": round(
            (1000.0 / per_img_ms) / max(rates["loader_w1"], 1e-9), 3),
    }
    for k, v in record["stages_ms"].items():
        print(f"{k:22s} {v:8.3f} ms")
    print(f"{'model per-img':22s} {per_img_ms:8.2f} ms "
          f"-> {1000.0 / per_img_ms:6.1f} img/s/worker "
          f"({8000.0 / per_img_ms:6.1f} @ 8 workers)")
    for k, v in record["measured_img_s"].items():
        print(f"{k:22s} {v:8.1f} img/s")

    out_path = Path(args.out)
    history = []
    if out_path.exists():
        try:
            history = json.loads(out_path.read_text())
        except Exception:  # noqa: BLE001
            history = []
    history.append(record)
    out_path.write_text(json.dumps(history, indent=1))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
