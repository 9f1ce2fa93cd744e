#!/usr/bin/env python
"""Upper-bound the BN-statistics cost in the train step (VERDICT r4
next-#4 scoping probe).

The named lever for the last diagnosed train-step tail is a fused
conv+BN-stat epilogue (compute batch moments inside the conv output
fusion). Its maximum possible win is bounded by the TOTAL cost of the
batch-moment machinery: fwd moment reduces + the moment terms of the
custom BN backward + running-stat updates. This probe measures that
bound directly by monkeypatching models/layers.batch_norm to
FROZEN-moment normalization (running stats, stop-gradient — numerically
wrong for training, perf-identical shape-wise) and step_slope-timing
the full SimOTA train step both ways.

  bound = base_ms - frozen_ms   (everything a perfect epilogue+fused
                                 backward could ever recover)

Prints ONE JSON line. Usage:
  python tools/exp_bn_cost.py [--batch 16] [--size 640] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from tools.exp_train_mfu import step_slope  # noqa: E402
from tools.profile_trace import build_train  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cfg", default=None)
    args = ap.parse_args()

    out = {"batch": args.batch, "size": args.size}

    run = build_train(args.batch, args.size, cfg=args.cfg)
    step, holder, *sargs = run.raw
    s = step_slope(step, holder["ts"], sargs, args.iters)
    out["base_ms"] = round(s * 1000, 2)
    print(f"[base]   {out['base_ms']} ms/step", flush=True)

    import yolo_series_tpu.models.layers as L

    _orig = L.batch_norm

    def frozen_bn(bn_params, bn_state, x, ctx):
        if not ctx.training:
            return _orig(bn_params, bn_state, x, ctx)
        scale, bias = bn_params["scale"], bn_params["bias"]
        mean = jax.lax.stop_gradient(bn_state["mean"])
        var = jax.lax.stop_gradient(bn_state["var"])
        inv = jax.lax.rsqrt(var + L.BN_EPS) * scale
        # written LINEAR in x (y = x*k + c) so autodiff saves only the
        # per-channel k — no fp32 activation residual sneaks in to
        # distort the comparison (see _bn_train_core's docstring)
        y = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return y.astype(x.dtype), bn_state

    L.batch_norm = frozen_bn
    try:
        run2 = build_train(args.batch, args.size, cfg=args.cfg)
        step2, holder2, *sargs2 = run2.raw
        s2 = step_slope(step2, holder2["ts"], sargs2, args.iters)
    finally:
        L.batch_norm = _orig
    out["frozen_ms"] = round(s2 * 1000, 2)
    out["bn_stat_bound_ms"] = round((s - s2) * 1000, 2)
    out["bn_stat_bound_pct"] = round(100 * (s - s2) / s, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
