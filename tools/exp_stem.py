#!/usr/bin/env python
"""Stem micro-experiments: where do the serving stem's 10.8 ms go?

Times the deploy-form stem (after make_fast_stem: k4s2 3->128 phase conv,
k2 128->64, k4s2 64->256, k2 256->128 — models/faststem.py) standalone at
bs32@640, plus layout/fusion variants, to decide the fused-stem Pallas
design. Timing is relay-safe (fetch of a small output slice bounds the
run, CLAUDE.md).

Usage: python tools/exp_stem.py [--batch 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, x, iters, label):
    out = fn(x)
    first = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:44s} {best * 1000.0:8.2f} ms/batch")
    return best


def stem_params(key=0):
    rng = np.random.default_rng(key)

    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32)

    # original fused conv forms (post fuse_model): L0 k3 3->32, L1 k3s2
    # 32->64, L2 k3 64->64, L3 k3s2 64->128 (cfg deploy/yolov7.yaml stem)
    return dict(
        w0=w(3, 3, 3, 32), b0=w(32),
        w1=w(3, 3, 32, 64), b1=w(64),
        w2=w(3, 3, 64, 64), b2=w(64),
        w3=w(3, 3, 64, 128), b3=w(128),
    )


def silu(v):
    return v * jax.nn.sigmoid(v)


def conv(x, w, s, pad=1):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (s, s), [(pad, pad), (pad, pad)],
        dimension_numbers=dn, preferred_element_type=jnp.bfloat16)


def conv_p(x, w, s, pad):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (s, s), pad,
        dimension_numbers=dn, preferred_element_type=jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    B = args.batch

    from yolo_series_tpu.models.faststem import _phase_weights

    p = stem_params()
    w4a, b4a, w2a = _phase_weights(np.asarray(p["w0"]), np.asarray(p["b0"]),
                                   np.asarray(p["w1"]))
    w4b, b4b, w2b = _phase_weights(np.asarray(p["w2"]), np.asarray(p["b2"]),
                                   np.asarray(p["w3"]))
    tpu = jax.devices()[0]
    P = {k: jax.device_put(jnp.asarray(v), tpu) for k, v in
         dict(p, w4a=w4a, b4a=b4a, w2a=w2a, w4b=w4b, b4b=b4b, w2b=w2b).items()}

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (B, 640, 640, 3), np.uint8)), tpu)

    @jax.jit
    def v_naive(x):
        """Original 4-conv stem, no phase fold."""
        h = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        h = silu(conv(h, P["w0"], 1) + P["b0"].astype(jnp.bfloat16))
        h = silu(conv(h, P["w1"], 2) + P["b1"].astype(jnp.bfloat16))
        h = silu(conv(h, P["w2"], 1) + P["b2"].astype(jnp.bfloat16))
        h = silu(conv(h, P["w3"], 2) + P["b3"].astype(jnp.bfloat16))
        return h

    @jax.jit
    def v_phased(x):
        """Current deploy fast-stem: two phase-folded pairs."""
        h = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        h = silu(conv_p(h, P["w4a"], 2, ((1, 1), (1, 1)))
                 + P["b4a"].astype(jnp.bfloat16))
        h = silu(conv_p(h, P["w2a"], 1, ((1, 0), (1, 0)))
                 + P["b1"].astype(jnp.bfloat16))
        h = silu(conv_p(h, P["w4b"], 2, ((1, 1), (1, 1)))
                 + P["b4b"].astype(jnp.bfloat16))
        h = silu(conv_p(h, P["w2b"], 1, ((1, 0), (1, 0)))
                 + P["b3"].astype(jnp.bfloat16))
        return h

    @jax.jit
    def v_pair1(x):
        """First phase pair only (isolate the hi-res half)."""
        h = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        h = silu(conv_p(h, P["w4a"], 2, ((1, 1), (1, 1)))
                 + P["b4a"].astype(jnp.bfloat16))
        h = silu(conv_p(h, P["w2a"], 1, ((1, 0), (1, 0)))
                 + P["b1"].astype(jnp.bfloat16))
        return h

    @jax.jit
    def v_conv1_only(x):
        """Just the k4s2 3->128 phase conv (input read + 840MB write)."""
        h = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        return silu(conv_p(h, P["w4a"], 2, ((1, 1), (1, 1)))
                    + P["b4a"].astype(jnp.bfloat16))

    @jax.jit
    def v_normalize_only(x):
        """uint8 -> bf16 normalize alone (input layout cost)."""
        return x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)

    timeit(v_normalize_only, x, args.iters, "normalize only (uint8->bf16)")
    timeit(v_conv1_only, x, args.iters, "phase conv1 only (3->128 k4s2)")
    timeit(v_pair1, x, args.iters, "phase pair 1 (3->128, ->64)")
    timeit(v_phased, x, args.iters, "current fast-stem (2 phase pairs)")
    timeit(v_naive, x, args.iters, "naive 4-conv stem")


if __name__ == "__main__":
    main()
