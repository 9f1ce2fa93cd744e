#!/usr/bin/env python
"""Serving throughput across the deploy model zoo on one TPU chip.

The reference publishes per-model FPS tables for its TRT deployments
(README.md "Performance" table and deploy/triton-inference-server
README.md:33-44); this measures the same end-to-end served contract
(uint8 in, fused head + decode + on-TPU NMS out) for every deploy cfg,
with the same transform stack bench.py uses (fuse + fast-stem; the
Pallas stem/ELAN kernels engage only via their env gates). Timing is the
relay-robust on-device slope (utils/chiprate.py).

Usage: python tools/bench_zoo.py [--models yolov7,yolov7-tiny,...]
       [--batch 32] [--iters 12]

P6 models (w6/e6/d6/e6e) run at 1280 like the reference's; P5 at 640.
Prints one JSON line per model.
"""

from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

P6 = ("yolov7-w6", "yolov7-e6", "yolov7-d6", "yolov7-e6e")
DEFAULT = ("yolov7-tiny", "yolov7", "yolov7x", "yolov7-w6", "yolov7-e6e")


def bench_one(name: str, batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.models.faststem import make_fast_stem
    from yolo_series_tpu.ops.pallas_elan import make_pallas_elan
    from yolo_series_tpu.ops.pallas_stem import make_pallas_stem
    from yolo_series_tpu.ops.nms import fused_head_nms

    size = 1280 if name in P6 else 640
    if name in P6 and batch > 8:
        batch = 8  # 1280px activations; keep HBM headroom
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml(f"yolo_series_tpu/models/cfg/deploy/{name}.yaml")
        params, state = fuse_model(m.plan, m.params, m.state)
        plan, params, state = make_pallas_stem(m.plan, params, state)
        plan, params, state = make_fast_stem(plan, params, state,
                                             max_pairs=2)
        plan, params, state = make_pallas_elan(plan, params, state)
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)
    head = plan.head
    hp_idx = len(plan.layers) - 1

    # params/state as jit ARGUMENTS (closure constants inline the weight
    # tree into the HLO; w6's 280 MB module trips the relay's 413 limit)
    def end2end(x, params, state):
        xf = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats, _ = apply_model(plan, params, state, xf, training=False,
                               dtype=jnp.bfloat16, return_head_inputs=True)
        return fused_head_nms(head, params["layers"][hp_idx], feats,
                              conf_thres=0.25,
                              iou_thres=0.45, max_det=300, max_nms=256,
                              compute_dtype=jnp.bfloat16)

    from yolo_series_tpu.utils.chiprate import chip_rate

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (batch, size, size, 3), np.uint8)),
        tpu)
    out = jax.jit(end2end)(x, params, state)
    _ = np.asarray(out[0])
    best = chip_rate(end2end, x, iters=iters, consts=(params, state))
    return {"model": name, "img_size": size, "batch": batch,
            "ms_per_batch": round(best * 1000.0, 2),
            "img_per_s": round(batch / best, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(DEFAULT))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()
    for name in args.models.split(","):
        print(json.dumps(bench_one(name.strip(), args.batch, args.iters)),
              flush=True)


if __name__ == "__main__":
    main()
