#!/usr/bin/env python
"""Op-level TPU profile of the serving program or the train step.

Replaces the reference's `torch_utils.profile` / nvprof workflow
(reference utils/torch_utils.py:110-153) with jax.profiler device traces,
which DO work through the axon relay. Runs the requested program a few
times under `jax.profiler.trace`, then parses the Chrome-trace export and
aggregates device-op durations by XLA fusion/op name.

Usage:
  python tools/profile_trace.py serve  [--batch 32] [--size 640]
  python tools/profile_trace.py train  [--batch 16] [--size 640]

Prints a per-op table (top 40) and a category rollup (convs, loop
fusions, copies/transposes, NMS loop, ...). The per-step total is the
sum over one representative step window, so numbers are comparable to
bench.py / PARITY.md step times.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _collect(trace_dir):
    tracefile = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )[-1]
    with gzip.open(tracefile) as f:
        events = json.load(f)["traceEvents"]
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"]["name"]
    # device op track: the TPU pid whose threads are XLA op streams
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device:" in n.lower() or "Chip" in n}
    ops = [e for e in events
           if e.get("ph") == "X" and e["pid"] in dev_pids
           and tid_name.get((e["pid"], e["tid"]), "").startswith("XLA Ops")]
    if not ops:  # fall back: any X event on a device pid
        ops = [e for e in events if e.get("ph") == "X" and e["pid"] in dev_pids]
    return ops


_CATS = (
    ("nms/while", re.compile(r"while|nms", re.I)),
    ("copy/transpose/pad", re.compile(r"copy|transpose|pad|bitcast|reshape|"
                                      r"data.format|dynamic.slice", re.I)),
    ("convolution fusions", re.compile(r"conv|dot", re.I)),
    ("pallas elan", re.compile(r"elan|custom.call", re.I)),
    ("reduce/moments", re.compile(r"reduce", re.I)),
    ("loop fusions", re.compile(r"fusion|loop", re.I)),
)


def summarize(ops, steps):
    by = {}
    for e in ops:
        n = e["name"]
        d = e.get("dur", 0) / 1000.0  # us -> ms
        t = by.setdefault(n, [0.0, 0])
        t[0] += d
        t[1] += 1
    rows = sorted(by.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in rows) / steps
    print(f"\n== device ops, per step (total {total:.2f} ms over "
          f"{steps} steps) ==")
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for n, (d, c) in rows[:40]:
        print(f"{d / steps:9.3f}  {c // steps:6d}  {n[:110]}")
    cats = {}
    for n, (d, c) in rows:
        for cat, pat in _CATS:
            if pat.search(n):
                cats[cat] = cats.get(cat, 0.0) + d / steps
                break
        else:
            cats.setdefault("other", 0.0)
            cats["other"] += d / steps
    print("\n== category rollup (ms/step) ==")
    for cat, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{d:9.2f}  {cat}")
    return total


def build_serve(batch, size, cfg=None, split_concat=False, lane_align=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.models.faststem import make_fast_stem
    from yolo_series_tpu.models.fastconcat import make_split_concat
    from yolo_series_tpu.ops.pallas_elan import make_pallas_elan
    from yolo_series_tpu.ops.pallas_stem import make_pallas_stem
    from yolo_series_tpu.ops.nms import fused_head_nms

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml(cfg or "yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
        params, state = fuse_model(m.plan, m.params, m.state)
        plan, params, state = make_pallas_stem(m.plan, params, state)
        plan, params, state = make_fast_stem(plan, params, state,
                                             max_pairs=2)
        plan, params, state = make_pallas_elan(plan, params, state)
        if split_concat:
            plan = make_split_concat(plan)
        if lane_align:
            from yolo_series_tpu.models.lanealign import make_lane_align
            plan = make_lane_align(plan)
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)
    head = plan.head
    hp_idx = len(plan.layers) - 1

    # params/state are jit ARGUMENTS, not closure constants: closed-over
    # weight trees inline into the HLO (w6 = 280 MB serialized) and the
    # dev relay's /remote_compile rejects bodies that large (HTTP 413)
    def end2end(x, params, state):
        xf = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats, _ = apply_model(plan, params, state, xf, training=False,
                               dtype=jnp.bfloat16, return_head_inputs=True)
        return fused_head_nms(head, params["layers"][hp_idx], feats,
                              conf_thres=0.25,
                              iou_thres=0.45, max_det=300, max_nms=256,
                              compute_dtype=jnp.bfloat16)

    end2end_j = jax.jit(end2end)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (batch, size, size, 3), np.uint8)),
        tpu)

    def run():
        out = end2end_j(x, params, state)
        return np.asarray(out[0])

    run.raw = (end2end, x, (params, state))
    return run


def build_train(batch, size, cfg=None, split_concat=False, lane_align=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.models.faststem import make_train_fast_stem
    from yolo_series_tpu.models.fastconcat import make_split_concat
    from yolo_series_tpu.losses.ota import make_compute_loss_ota
    from yolo_series_tpu.losses.yolo_loss import LossHyp
    from yolo_series_tpu.train.optim import OptimConfig
    from yolo_series_tpu.train.step import init_train_state, make_train_step

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml(
            cfg or "yolo_series_tpu/models/cfg/training/yolov7.yaml")
        plan = m.plan
        step_plan = make_train_fast_stem(plan)
        if split_concat:
            step_plan = make_split_concat(step_plan)
        if lane_align:
            from yolo_series_tpu.models.lanealign import make_lane_align
            step_plan = make_lane_align(step_plan)
        from yolo_series_tpu.models.heads import IAuxDetect
        if isinstance(plan.head, IAuxDetect):
            # P6 training cfgs (w6/e6/d6/e6e) train with the aux OTA loss
            from yolo_series_tpu.losses.aux_ota import make_compute_loss_aux_ota
            loss_fn = make_compute_loss_aux_ota(plan.head, LossHyp())
        else:
            loss_fn = make_compute_loss_ota(plan.head, LossHyp())
        ts = init_train_state(m.params, m.state, OptimConfig())
    step = make_train_step(step_plan, loss_fn, OptimConfig())
    tpu = jax.devices()[0]
    ts = jax.device_put(ts, tpu)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, size, size, 3), np.uint8)), tpu)
    lbs = np.zeros((batch, 32, 5), np.float32)
    lbs[:, :8, 1:] = rng.uniform(0.25, 0.75, (batch, 8, 4))
    lbs[:, :8, 3:] = 0.1
    lbs = jax.device_put(jnp.asarray(lbs), tpu)
    mks = jax.device_put(
        jnp.asarray(np.tile(np.arange(32) < 8, (batch, 1))), tpu)
    lr = jax.device_put(jnp.asarray([0.01, 0.01, 0.01], jnp.float32), tpu)
    mom = jax.device_put(jnp.float32(0.937), tpu)

    holder = {"ts": ts}

    def run():
        holder["ts"], met = step(holder["ts"], imgs, lbs, mks, lr, mom)
        return float(met["total"])

    # expose the raw pieces for callers that want back-to-back dispatch
    # (per-step fetch pays a full relay RTT on the dev tunnel)
    run.raw = (step, holder, imgs, lbs, mks, lr, mom)
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["serve", "train"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace_tool")
    ap.add_argument("--cfg", default=None, help="model yaml (default yolov7)")
    ap.add_argument("--split-concat", action="store_true",
                    help="apply models/fastconcat.make_split_concat")
    args = ap.parse_args()

    import jax
    batch = args.batch or (32 if args.mode == "serve" else 16)
    run = (build_serve if args.mode == "serve" else build_train)(
        batch, args.size, cfg=args.cfg, split_concat=args.split_concat)
    run()  # compile + warmup
    run()
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        run()
    jax.profiler.stop_trace()
    ops = _collect(args.trace_dir)
    summarize(ops, args.steps)


if __name__ == "__main__":
    main()
