#!/usr/bin/env python
"""Benchmark: end-to-end detection throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the serving path of the flagship model (yolov7, re-parameterized
deploy form, bf16): forward + in-graph decode + on-TPU batched NMS at
640x640 — the same contract as the reference's TensorRT-FP16 end2end
engine with EfficientNMS (deploy/triton-inference-server/README.md:33-44:
588 img/s on RTX 3090, the vs_baseline denominator).

Timing methodology: the axon relay makes per-call host sync unreliable, so
iterations are chained *inside* one jit via lax.scan with a data dependency
(prevents CSE), and the wall clock covers a single device program + one
small host fetch.
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
ITERS = 16
BASELINE_FPS = 588.0  # reference TRT-FP16 bs8 on RTX 3090


def main():
    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.nms import _single_image_nms
    import functools

    # init + fuse on the host CPU backend: eager per-layer init through the
    # TPU relay costs minutes; one device_put ships the final tree
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
        params, state = fuse_model(m.plan, m.params, m.state)
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)

    nms_fn = functools.partial(
        _single_image_nms, conf_thres=0.25, iou_thres=0.45, multi_label=False,
        agnostic=False, max_det=300, max_nms=512, max_wh=4096.0, nc=m.plan.nc,
        tile=256, class_mask=None)

    def end2end(x):
        out, _ = apply_model(m.plan, params, state, x, training=False,
                             dtype=jnp.bfloat16)
        num, boxes, scores, cls = jax.vmap(nms_fn)(out["pred"].astype(jnp.float32))
        return num, boxes, scores, cls

    @jax.jit
    def bench_loop(x):
        def body(carry, _):
            xc, acc = carry
            num, boxes, scores, cls = end2end(xc)
            # data dependency so scan iterations can't be CSE'd or elided
            bump = (jnp.sum(num) + jnp.sum(scores)).astype(x.dtype) * 1e-12
            return (xc + bump, acc + jnp.sum(num)), None

        (xf, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), None, length=ITERS)
        return acc, xf[0, 0, 0, 0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, IMG, IMG, 3)).astype(np.float32))

    acc, _ = bench_loop(x)  # compile + warmup
    _ = np.asarray(acc)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc, probe = bench_loop(x)
        _ = np.asarray(probe)  # sync
        best = min(best, time.perf_counter() - t0)

    per_batch = best / ITERS
    fps = BATCH / per_batch
    print(json.dumps({
        "metric": "images_per_sec_per_chip_yolov7_640_e2e_bs32",
        "value": round(fps, 1),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
