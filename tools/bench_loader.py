"""Measure training input-pipeline throughput (VERDICT r1 item 4).

The train step consumes ~119 img/s (bs16 @ 134.5 ms); the aug pipeline
(mosaic4/9 + random_perspective + HSV + flips, reference
datasets.py:826-922) runs on host CPU. This benchmark answers whether the
loader can feed the chip, on THIS machine's core count.

Usage: python tools/bench_loader.py [--n 128] [--img 640] [--bs 16]
Prints one JSON line: {"metric": "loader_img_per_sec", ...}.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make_synthetic_dataset(root: Path, n: int, hw=(480, 640)):
    """JPEG-encoded synthetic images + labels mirroring COCO layout.

    Real-photo JPEG decode cost is dominated by resolution, not content;
    noise images give a conservative (worst-case) decode time.
    """
    import cv2

    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        h, w = hw
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        # smooth it so JPEG size/decode cost is photo-like, not noise-like
        img = cv2.GaussianBlur(img, (0, 0), 3)
        cv2.imwrite(str(root / "images" / f"im{i:04d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        rows = []
        for _ in range(int(rng.integers(2, 10))):
            bw, bh = rng.uniform(0.08, 0.4, 2)
            cx = rng.uniform(bw / 2, 1 - bw / 2)
            cy = rng.uniform(bh / 2, 1 - bh / 2)
            rows.append(f"{int(rng.integers(0, 80))} {cx:.4f} {cy:.4f}"
                        f" {bw:.4f} {bh:.4f}")
        (root / "labels" / f"im{i:04d}.txt").write_text("\n".join(rows))
    return [str(p) for p in sorted((root / "images").glob("*.jpg"))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--device-tail", action="store_true",
                    help="host half only: mosaic compose + label math "
                         "(warp/HSV/flip/mixup run on device)")
    ap.add_argument("--cache-images", action="store_true")
    ap.add_argument("--workers", type=int, default=1,
                    help="loader decode threads (reference --workers)")
    ap.add_argument("--fast-decode", action="store_true")
    args = ap.parse_args()

    from yolo_series_tpu.data.datasets import DetectionDataset, create_loader

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        files = make_synthetic_dataset(root, args.n)
        ds = DetectionDataset(files, img_size=args.img, batch_size=args.bs,
                              augment=not args.no_augment,
                              device_tail=args.device_tail,
                              cache_images=args.cache_images,
                              fast_decode=args.fast_decode,
                              cache_path=str(root / "cache.npz"))
        loader = create_loader(ds, batch_size=args.bs, shuffle=True,
                               workers=args.workers)

        # warm epoch (label cache, allocator)
        for _ in loader:
            pass
        t0 = time.perf_counter()
        n_img = 0
        for _ in range(args.epochs):
            loader.epoch += 1
            for batch in loader:
                key = "canvases" if "canvases" in batch else "images"
                n_img += batch[key].shape[0]
        dt = time.perf_counter() - t0
        rate = n_img / dt
        # the full yolov7 train step consumes bs16/134.5ms = ~119 img/s
        out = {"metric": "loader_img_per_sec", "value": round(rate, 1),
               "unit": "img/s", "imgs": n_img, "seconds": round(dt, 2),
               "augment": not args.no_augment,
               "device_tail": args.device_tail,
               "cache_images": args.cache_images,
               "workers": args.workers,
               "fast_decode": args.fast_decode,
               "feeds_119imgs_consumer": rate > 119.0}
        print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
