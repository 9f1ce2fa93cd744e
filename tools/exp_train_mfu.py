"""Train-step MFU experiments (VERDICT r3 item 3): push past ~34% MFU.

Measures the full yolov7 SimOTA train step (fwd + assign + bwd + SGD +
EMA, one XLA program) at bs16@640 with the levers VERDICT names:

  * stem remat: jax.checkpoint over the first K layers — the backward
    pass recomputes the HBM-bound 640px stem activations instead of
    re-reading them (models/model.py apply_model(remat_prefix=K))
  * train batch sweep: bs16 / bs24 / bs32 (ms per IMAGE is the metric)

Timing is the on-device scan-slope (N vs 2N chained steps via
lax.fori_loop, slope removes the fixed dispatch cost) — the same
methodology as bench.py / the PARITY.md 75.6 ms figure.

Usage: python tools/exp_train_mfu.py [--iters 8] [--remat 0,2,4,6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def build(batch, size, remat_prefix, fast_stem=True):
    from yolo_series_tpu.losses.ota import make_compute_loss_ota
    from yolo_series_tpu.losses.yolo_loss import LossHyp
    from yolo_series_tpu.models.faststem import make_train_fast_stem
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.train.optim import OptimConfig
    from yolo_series_tpu.train.step import init_train_state, make_train_step

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7.yaml")
        plan = m.plan
        step_plan = make_train_fast_stem(plan) if fast_stem else plan
        loss_fn = make_compute_loss_ota(plan.head, LossHyp())
        ts = init_train_state(m.params, m.state, OptimConfig())
    step = make_train_step(step_plan, loss_fn, OptimConfig(),
                           remat_prefix=remat_prefix)
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
    return step, ts, (imgs, lbs, mks, lr, mom)


def step_slope(step, ts, args, iters):
    """Seconds/step: (time(2N) - time(N)) / N of on-device chained steps.

    The carry state is DONATED through every call so only one train-state
    copy is ever live — w6-sized states (~840 MB params+mom+EMA) plus
    bs4@1280 aux activations OOM the chip if the input/output copies of
    each timed run coexist (observed RESOURCE_EXHAUSTED, 2026-08-19).
    """

    @partial(jax.jit, donate_argnums=0)
    def run_n(ts0, n):
        def body(_, ts):
            ts2, _m = step(ts, *args)
            return ts2
        return jax.lax.fori_loop(0, n, body, ts0)

    ts = run_n(ts, 1)
    _ = np.asarray(ts.step)  # compile + settle

    def timed(n):
        nonlocal ts
        t0 = time.perf_counter()
        ts = run_n(ts, n)
        _ = np.asarray(ts.step)
        return time.perf_counter() - t0

    # donation chains the state forward; alternate N/2N, best-of-2 each
    t1 = min(timed(iters), timed(iters))
    t2 = min(timed(2 * iters), timed(2 * iters))
    return (t2 - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--remat", default="0,2,4,6")
    ap.add_argument("--batches", default="16")
    args = ap.parse_args()

    results = {}
    for bs in (int(b) for b in args.batches.split(",")):
        for rp in (int(r) for r in args.remat.split(",")):
            key = f"bs{bs}/remat{rp}"
            t0 = time.time()
            step, ts, a = build(bs, args.size, rp)
            sec = step_slope(step, ts, a, args.iters)
            results[key] = sec
            print(f"{key:16s} {sec * 1000:8.2f} ms/step  "
                  f"{sec / bs * 1000:6.3f} ms/img  "
                  f"({bs / sec:6.1f} img/s)  [built+measured "
                  f"{time.time() - t0:.0f}s]", flush=True)
    best = min(results, key=results.get)
    print(f"best: {best} @ {results[best] * 1000:.2f} ms/step")


if __name__ == "__main__":
    main()
