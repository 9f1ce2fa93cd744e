#!/usr/bin/env python
"""End-to-end serving A/B: bf16 engine vs mixed-int8 engine (VERDICT r4
next-#3 follow-through).

The mixed engine quantizes ONLY the Pallas-int8-eligible 1x1 convs
(infer/quant.quantize_model(mixed=True)) — those run on the int8 MXU at
1.48x bf16 compute (ops/pallas_int8.py) — and keeps stems/3x3s/head in
bf16, mirroring TRT's per-layer INT8 tactic selection
(reference README.md:192-228). Calibration runs eagerly on CPU (the
relay makes eager TPU dispatch pathological), quantization is a pure
pytree transform, and both engines compile the same fused head+NMS
program.

Prints ONE JSON line: {bf16_img_s, int8_img_s, speedup}.

Usage: python tools/exp_int8_serve.py [--batch 32] [--size 640]
       [--cfg .../deploy/yolov7.yaml]
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
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def build(cfg, batch, size, int8: bool):
    from yolo_series_tpu.infer.serving import ServingEngine
    from yolo_series_tpu.models.faststem import make_fast_stem
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.pallas_stem import make_pallas_stem

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml(cfg)
        params, state = fuse_model(m.plan, m.params, m.state)
        if not int8:
            return ServingEngine(m.plan, params, state, batch_size=batch,
                                 img_size=size)
        # calibrate on the PLAIN fused plan (CPU eager — Pallas stem
        # kernels can't run off-TPU), quantize the eligible 1x1s, THEN
        # apply the stem transforms: both passes rewrite stem layers in
        # place (indices stable, stem leaves stay fp in mixed mode)
        from yolo_series_tpu.infer.quant import calibrate, quantize_model
        rng = np.random.default_rng(0)
        cal = [rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
               for _ in range(2)]
        scales = calibrate(m.plan, params, state, cal)
        params, state = quantize_model(m.plan, params, state, scales,
                                       mixed=True)
        plan, params, state = make_pallas_stem(m.plan, params, state)
        plan, params, state = make_fast_stem(plan, params, state,
                                             max_pairs=2)
        nq = sum(1 for _ in _iter_wq(params))
        print(f"[int8] {nq} convs quantized (mixed), "
              f"{len(scales)} scales", flush=True)
    return ServingEngine(plan, params, state, batch_size=batch,
                         img_size=size, fast_stem=False, pallas_elan=False)


def _iter_wq(tree):
    if isinstance(tree, dict):
        if "wq" in tree:
            yield tree
        for v in tree.values():
            yield from _iter_wq(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _iter_wq(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variant", default="both",
                    choices=["both", "bf16", "int8"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (args.batch, args.size, args.size, 3),
                     np.uint8)
    out = {"batch": args.batch, "size": args.size, "cfg": args.cfg}
    for name in ("bf16", "int8"):
        if args.variant not in ("both", name):
            continue
        t0 = time.time()
        eng = build(args.cfg, args.batch, args.size, int8=name == "int8")
        eng.warmup(2)
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(args.iters):
                r = eng.infer(x)
            best = min(best, (time.perf_counter() - t1) / args.iters)
        out[f"{name}_ms"] = round(best * 1000, 2)
        out[f"{name}_img_s"] = round(args.batch / best, 1)
        print(f"[{name}] {best * 1000:.2f} ms/batch = "
              f"{args.batch / best:.1f} img/s "
              f"(wall {time.time() - t0:.0f}s incl compile)", flush=True)
        del eng
    if "bf16_img_s" in out and "int8_img_s" in out:
        out["speedup"] = round(out["int8_img_s"] / out["bf16_img_s"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
