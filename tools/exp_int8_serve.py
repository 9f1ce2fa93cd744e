#!/usr/bin/env python
"""End-to-end serving A/B: bf16 vs mixed-int8 (VERDICT r4 next-#3
follow-through).

The mixed engine quantizes ONLY the Pallas-int8-eligible 1x1 convs
(infer/quant.quantize_model(mixed=True)) — those run on the int8 MXU at
1.48x bf16 compute (ops/pallas_int8.py) — and keeps stems/3x3s/head in
bf16, mirroring TRT's per-layer INT8 tactic selection (reference
README.md:192-228). Calibration runs eagerly on CPU (the relay makes
eager TPU dispatch pathological); quantization is a pure pytree
transform.

The measured program is EXACTLY bench.py's end2end (same transform
stack, closure params, fused head+NMS, chip_rate slope timing), so the
bf16 leg hits bench's compile cache and the numbers are directly
comparable to the headline 901.5 img/s.

Prints ONE JSON line per variant. Run each leg in its own process:
  python tools/exp_int8_serve.py --variant bf16
  python tools/exp_int8_serve.py --variant int8
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


def _iter_wq(tree):
    if isinstance(tree, dict):
        if "wq" in tree:
            yield tree
        for v in tree.values():
            yield from _iter_wq(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _iter_wq(v)


def build(cfg, size, int8: bool):
    from yolo_series_tpu.models.faststem import make_fast_stem
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.pallas_elan import make_pallas_elan
    from yolo_series_tpu.ops.pallas_stem import make_pallas_stem

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml(cfg)
        params, state = fuse_model(m.plan, m.params, m.state)
        plan = m.plan
        if int8:
            # calibrate on the PLAIN fused plan (CPU eager — Pallas stem
            # kernels can't run off-TPU), quantize the eligible 1x1s,
            # THEN the stem transforms (they rewrite stem layers in
            # place; indices stable, stem leaves stay fp in mixed mode)
            from yolo_series_tpu.infer.quant import calibrate, quantize_model
            rng = np.random.default_rng(0)
            cal = [rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
                   for _ in range(2)]
            scales = calibrate(plan, params, state, cal)
            params, state = quantize_model(plan, params, state, scales,
                                           mixed=True)
            nq = sum(1 for _ in _iter_wq(params))
            print(f"[int8] {nq} convs quantized (mixed), "
                  f"{len(scales)} scales", flush=True)
        plan, params, state = make_pallas_stem(plan, params, state)
        plan, params, state = make_fast_stem(plan, params, state,
                                             max_pairs=2)
        plan, params, state = make_pallas_elan(plan, params, state)
    return plan, params, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variant", required=True, choices=["bf16", "int8"])
    args = ap.parse_args()

    from yolo_series_tpu.models.model import apply_model
    from yolo_series_tpu.ops.nms import fused_head_nms
    from yolo_series_tpu.utils.chiprate import chip_rate

    t0 = time.time()
    plan, params, state = build(args.cfg, args.size,
                                int8=args.variant == "int8")
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)
    head = plan.head
    hp = params["layers"][len(plan.layers) - 1]

    @jax.jit
    def end2end(x):
        xf = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats, _ = apply_model(plan, params, state, xf, training=False,
                               dtype=jnp.bfloat16, return_head_inputs=True)
        return fused_head_nms(head, hp, feats, conf_thres=0.25,
                              iou_thres=0.45, max_det=300, max_nms=256,
                              compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (args.batch, args.size, args.size, 3),
                     np.uint8)), tpu)
    out = end2end(x)
    _ = np.asarray(out[0])
    per_batch = chip_rate(end2end, x, iters=args.iters)
    print(json.dumps({
        "variant": args.variant, "batch": args.batch, "size": args.size,
        "ms_per_batch": round(per_batch * 1000, 2),
        "img_per_s": round(args.batch / per_batch, 1),
        "wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
