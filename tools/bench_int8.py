#!/usr/bin/env python
"""INT8 lowering probe — the round-2 finding ("XLA emits no fast int8
conv lowering for v5e") rested on ONE lowering (int8
conv_general_dilated). yolov7's FLOPs are dominated by 1x1 convs, which
are plain matmuls; this probes every candidate lowering on the
representative 1x1 shapes and records what each compiles to:

  a) bf16 conv_general_dilated           (the serving baseline)
  b) int8 conv_general_dilated -> int32  (round-2 attempt)
  c) int8 dot_general -> int32           (1x1 conv as matmul)
  d) int8 dot_general -> bf16 preferred  (let XLA pick accumulation)

Prints one JSON line: per-shape ms for each lowering + the HLO op the
dot lowered to. The 3x3 stem convs are probed with (a)/(b) only.
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

# (B*H*W, Cin, Cout): the dominant yolov7 1x1 conv shapes @640 (bs8 —
# larger int8 shapes drove the remote compiler into multi-hour compiles
# that wedged the dev terminal; per-element timing scales linearly)
SHAPES_1X1 = [
    (8 * 40 * 40, 1024, 512),
    (8 * 20 * 20, 2048, 1024),
]


def _fetch_scalar(out):
    # device-side slice, then fetch ONE element — np.asarray(out) would pull
    # the whole result through the 27 MB/s dev tunnel and time the transfer
    return np.asarray(out[(0,) * out.ndim])


def _time(fn, *args, iters=20):
    out = fn(*args)
    _fetch_scalar(out)
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        for _j in range(iters):
            out = fn(*args)
        _fetch_scalar(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def probe_shape(m, k, n):
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
    wf = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
    wq = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))

    row = {}

    @jax.jit
    def dot_bf16(a, b):
        return jax.lax.dot(a, b)

    row["bf16_dot_ms"] = _time(dot_bf16, xf, wf)

    @jax.jit
    def dot_i8_i32(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    row["int8_dot_i32_ms"] = _time(dot_i8_i32, xq, wq)
    hlo = jax.jit(dot_i8_i32).lower(xq, wq).compile().as_text()
    for ln in hlo.splitlines():
        if " dot(" in ln or "convolution(" in ln or "fusion(" in ln:
            row.setdefault("int8_dot_hlo", ln.strip().split(" metadata")[0][:160])

    # conv formulations on the NHWC image layout
    b, hw = 32, int((m // 32) ** 0.5)
    xcf = jnp.asarray(rng.normal(size=(b, hw, hw, k)).astype(np.float32),
                      jnp.bfloat16)
    wcf = jnp.asarray(rng.normal(size=(1, 1, k, n)).astype(np.float32),
                      jnp.bfloat16)
    xcq = jnp.asarray(rng.integers(-127, 127, (b, hw, hw, k), np.int8))
    wcq = jnp.asarray(rng.integers(-127, 127, (1, 1, k, n), np.int8))
    dn = jax.lax.conv_dimension_numbers(xcf.shape, wcf.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf16(a, b_):
        return jax.lax.conv_general_dilated(a, b_, (1, 1), "VALID",
                                            dimension_numbers=dn)

    @jax.jit
    def conv_i8(a, b_):
        return jax.lax.conv_general_dilated(
            a, b_, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    row["bf16_conv_ms"] = _time(conv_bf16, xcf, wcf)
    row["int8_conv_i32_ms"] = _time(conv_i8, xcq, wcq)
    return row


def main():
    out = {}
    for m, k, n in SHAPES_1X1:
        out[f"{m}x{k}x{n}"] = probe_shape(m, k, n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
