#!/usr/bin/env python
"""Concurrent-client serving benchmark — the Triton load-test protocol.

The reference publishes its serving numbers under 16-client load
(deploy/triton-inference-server/README.md:115-122):

    dynamic batching ON :  590.1 infer/s @ 27.08 ms avg latency
    dynamic batching OFF:  335.6 infer/s @ 47.60 ms avg latency
    (RTX 3090, TRT-FP16 end2end engine, bs1 requests)

This drives the same shape of load against infer/serving.py: N client
threads each submit single 640x640 uint8 frames in a closed loop and wait
for their detections.

  * batching ON : DynamicBatcher (micro-batches up to the engine batch,
    pipelined completion — multiple in-flight executions like Triton)
  * batching OFF: a batch-1 engine behind a mutex (one request at a time,
    the Triton `dynamic_batching` stanza removed)

Prints one JSON line with infer/s and p50/p99 client latency per mode.
NOTE on the dev tunnel: the axon relay adds ~35 ms RTT per device->host
fetch; the pipelined completer overlaps it, the serialized OFF mode
cannot. A host-attached TPU loses that constant.
"""

import argparse
import json
import os
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def build(batch_size, img=640, pack_output=False):
    from yolo_series_tpu.infer.serving import ServingEngine
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.models.reparam import fuse_model

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
        params, state = fuse_model(m.plan, m.params, m.state)
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)
    eng = ServingEngine(m.plan, params, state, batch_size=batch_size,
                        img_size=img, conf_thres=0.25, iou_thres=0.45,
                        max_det=100, max_nms=256, pack_output=pack_output)
    eng.warmup(2)
    return eng


def run_clients(n_clients, seconds, submit_and_wait, img=640):
    """Closed-loop clients; returns (infer/s, p50_ms, p99_ms, count)."""
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (img, img, 3), np.uint8)
              for _ in range(n_clients)]
    lat = [[] for _ in range(n_clients)]
    stop = time.perf_counter() + seconds
    barrier = threading.Barrier(n_clients + 1)

    def client(ci):
        barrier.wait()
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            submit_and_wait(frames[ci])
            lat[ci].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t_start = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    all_lat = np.array([v for c in lat for v in c]) * 1e3
    n = len(all_lat)
    return n / wall, float(np.percentile(all_lat, 50)), \
        float(np.percentile(all_lat, 99)), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    ap.add_argument("--prestaged", action="store_true",
                    help="substitute a pre-staged device batch for the "
                         "client pixels: measures the serving stack "
                         "(queue+batch+compute+fetch) without the dev "
                         "tunnel's ~27 MB/s input link, which otherwise "
                         "caps ANY engine at ~22 frames/s")
    args = ap.parse_args()

    from yolo_series_tpu.infer.serving import DynamicBatcher

    stage_fn = None
    if args.prestaged:
        rng = np.random.default_rng(1)
        staged = jax.device_put(jnp.asarray(rng.integers(
            0, 255, (args.batch_size, 640, 640, 3), np.uint8)),
            jax.devices()[0])
        stage_fn = lambda frames: staged  # noqa: E731

    # -- dynamic batching ON -------------------------------------------------
    eng = build(args.batch_size, pack_output=True)
    batcher = DynamicBatcher(eng, max_delay_ms=args.max_delay_ms,
                             stage_fn=stage_fn)

    def with_batching(frame):
        return DynamicBatcher.wait(batcher.submit(frame))

    on = run_clients(args.clients, args.seconds, with_batching)
    batcher.close()

    # -- dynamic batching OFF (serialized bs1 requests) ----------------------
    eng1 = build(1, pack_output=True)
    staged1 = (jax.device_put(staged[:1]) if args.prestaged else None)
    lock = threading.Lock()

    def without_batching(frame):
        with lock:
            return eng1.infer(staged1 if args.prestaged else frame[None])

    off = run_clients(args.clients, args.seconds, without_batching)

    print(json.dumps({
        "clients": args.clients, "engine_batch": args.batch_size,
        "prestaged_input": bool(args.prestaged),
        "dynamic_batching_on": {
            "infer_per_sec": round(on[0], 1), "p50_ms": round(on[1], 2),
            "p99_ms": round(on[2], 2), "requests": on[3]},
        "dynamic_batching_off": {
            "infer_per_sec": round(off[0], 1), "p50_ms": round(off[1], 2),
            "p99_ms": round(off[2], 2), "requests": off[3]},
        "baseline_rtx3090_trt": {"on": 590.1, "off": 335.6},
    }))


if __name__ == "__main__":
    main()
