#!/usr/bin/env python
"""Benchmark: end-to-end detection throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the serving path of the flagship model (yolov7, re-parameterized
deploy form, bf16): forward + in-graph decode + on-TPU batched NMS at
640x640 — the same contract as the reference's TensorRT-FP16 end2end
engine with EfficientNMS (deploy/triton-inference-server/README.md:33-44:
588 img/s on RTX 3090, the vs_baseline denominator).

Timing: batches are dispatched back-to-back (device executes in order, as a
serving queue would) and the LAST batch's output is fetched to the host,
which bounds completion of the whole run — robust against the axon relay's
unreliable block_until_ready.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

BATCH = 32
IMG = 640
ITERS = 20
BASELINE_FPS = 588.0  # reference TRT-FP16 bs8 on RTX 3090


def main():
    import functools

    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.nms import _single_image_nms

    # init + fuse on the host CPU backend: eager per-layer init through the
    # TPU relay costs minutes; one device_put ships the final tree
    from yolo_series_tpu.models.faststem import make_fast_stem

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
        params, state = fuse_model(m.plan, m.params, m.state)
        plan, params, state = make_fast_stem(m.plan, params, state, max_pairs=2)
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)

    nms_fn = functools.partial(
        _single_image_nms, conf_thres=0.25, iou_thres=0.45, multi_label=False,
        agnostic=False, max_det=300, max_nms=256, max_wh=4096.0, nc=m.plan.nc,
        tile=256, class_mask=None, score_dtype=jnp.bfloat16)

    @jax.jit
    def end2end(x):
        out, _ = apply_model(plan, params, state, x, training=False,
                             dtype=jnp.bfloat16)
        return jax.vmap(nms_fn)(out["pred"].astype(jnp.float32))

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (BATCH, IMG, IMG, 3)).astype(np.float32)),
        tpu)

    out = end2end(x)                      # compile + warmup
    _ = np.asarray(out[0])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = end2end(x)              # back-to-back dispatch
        _ = np.asarray(out[0])            # fetch of last batch bounds the run
        best = min(best, (time.perf_counter() - t0) / ITERS)

    fps = BATCH / best
    print(json.dumps({
        "metric": "images_per_sec_per_chip_yolov7_640_e2e_bs32",
        "value": round(fps, 1),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
