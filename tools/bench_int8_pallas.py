#!/usr/bin/env python
"""INT8 matmul at the Pallas level (VERDICT r4 next-#3).

Rounds 2-4 established that XLA exposes no int8 MXU path on v5e: an
int8xint8->int32 dot_general lowers to `s32 convolution` wrapped in
convert fusions and times ~bf16 (tools/bench_int8.py, PARITY.md "int8
postmortem"). v5e's MXU advertises ~2x int8 peak, so the open question
was whether a kernel that CONTROLS the lowering — Pallas/Mosaic — can
reach it.

This probes a blocked Pallas matmul at the dominant yolov7 1x1-conv
shapes (same shapes as tools/bench_int8.py) in three variants:

  a) pallas bf16 x bf16 -> f32   (control: the kernel framework's own
                                  bf16 ceiling, separates kernel overhead
                                  from dtype effects)
  b) pallas int8 x int8 -> int32 (the candidate 2x path)
  c) XLA bf16 dot                (the shipped serving lowering)

Prints ONE JSON line with per-shape ms + the verdict. If (b) fails to
lower, the Mosaic error is recorded — that IS the evidence.

Run on the real chip:  python tools/bench_int8_pallas.py
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

SHAPES_1X1 = [
    (8 * 40 * 40, 1024, 512),
    (8 * 20 * 20, 2048, 1024),
]


def _fetch_scalar(out):
    return np.asarray(out[(0,) * out.ndim])


def _time(fn, *args, iters=20):
    out = fn(*args)
    _fetch_scalar(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch_scalar(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def _mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, acc_dtype):
    # K-innermost grid; accumulate across K blocks in VMEM scratch
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], w_ref[...],
                            preferred_element_type=acc_dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pallas_matmul(x, w, *, bm=256, bk=512, bn=256, acc_dtype=jnp.int32,
                  out_dtype=jnp.int32):
    m, k = x.shape
    _, n = w.shape
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(k, bk))
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                  pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


def _chain(matmul, r, requant):
    """In-graph chain of `r` dependent matmuls — amortizes the relay
    dispatch floor that capped tools/bench_int8.py at ~4% MFU (both
    prior probes were dispatch-bound, not compute-bound). The output
    feeds the next input (square K=N), so XLA cannot elide iterations;
    `requant` maps the accumulator back to the input dtype."""

    def fn(x, w):
        def body(_, y):
            return requant(matmul(y, w))

        return jax.lax.fori_loop(0, r, body, x)

    return jax.jit(fn)


def probe_compute(m=8192, k=1024, bm=256, bk=512, bn=256, sweep=False):
    """Slope-timed compute rate: t(R2) - t(R1) isolates per-matmul chip
    time. Reports effective TOPS for bf16 (XLA dot), Pallas bf16 and
    Pallas int8 at square (m,k)x(k,k). With sweep=True, tries a grid of
    (bm,bk,bn) blockings for the int8 kernel and reports the best."""
    rng = np.random.default_rng(0)
    row = {}
    flops = 2.0 * m * k * k
    r1, r2 = 8, 40

    xf = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                     jnp.bfloat16)
    wf = jnp.asarray((rng.normal(size=(k, k)) / np.sqrt(k)).astype(
        np.float32), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
    wq = jnp.asarray(rng.integers(-127, 127, (k, k), np.int8))

    def measure(mk, x, w):
        f1, f2 = mk(r1), mk(r2)
        t1 = _time(f1, x, w, iters=5)
        t2 = _time(f2, x, w, iters=5)
        return (t2 - t1) / (r2 - r1)  # ms per matmul on-chip

    # (a) XLA bf16 dot
    ms = measure(lambda r: _chain(
        lambda a, b: jax.lax.dot(a, b),
        r, lambda y: jnp.tanh(y)), xf, wf)
    row["xla_bf16_ms_per_mm"] = round(ms, 4)
    row["xla_bf16_tops"] = round(flops / (ms * 1e-3) / 1e12, 1)

    # (b) Pallas bf16 (f32 accum, tanh requant keeps values bounded)
    ms = measure(lambda r: _chain(
        lambda a, b: pallas_matmul(a, b, bm=bm, bk=bk, bn=bn,
                                   acc_dtype=jnp.float32,
                                   out_dtype=jnp.float32),
        r, lambda y: jnp.tanh(y).astype(jnp.bfloat16)), xf, wf)
    row["pallas_bf16_ms_per_mm"] = round(ms, 4)
    row["pallas_bf16_tops"] = round(flops / (ms * 1e-3) / 1e12, 1)

    # (c) Pallas int8 -> int32, shift-requant back to int8
    def int8_ms(bm_, bk_, bn_):
        return measure(lambda r: _chain(
            lambda a, b: pallas_matmul(a, b, bm=bm_, bk=bk_, bn=bn_,
                                       acc_dtype=jnp.int32,
                                       out_dtype=jnp.int32),
            r, lambda y: (y >> 9).astype(jnp.int8)), xq, wq)

    ms = int8_ms(bm, bk, bn)
    row["pallas_int8_ms_per_mm"] = round(ms, 4)
    row["pallas_int8_tops"] = round(flops / (ms * 1e-3) / 1e12, 1)

    if sweep:
        grid = [(512, 512, 256), (512, 1024, 256), (512, 512, 512),
                (1024, 512, 256), (256, 1024, 512), (512, 256, 512),
                (1024, 1024, 256), (256, 512, 1024), (2048, 1024, 128),
                (1024, 256, 512)]
        best = (row["pallas_int8_ms_per_mm"], (bm, bk, bn))
        for cfg in grid:
            try:
                t = int8_ms(*cfg)
            except Exception as e:  # noqa: BLE001
                row[f"int8_{cfg}"] = repr(e)[:120]
                continue
            row[f"int8_{'x'.join(map(str, cfg))}_tops"] = round(
                flops / (t * 1e-3) / 1e12, 1)
            if t < best[0]:
                best = (t, cfg)
        row["pallas_int8_best_ms"] = round(best[0], 4)
        row["pallas_int8_best_block"] = best[1]
        row["pallas_int8_best_tops"] = round(
            flops / (best[0] * 1e-3) / 1e12, 1)
        row["int8_vs_bf16_compute_speedup"] = round(
            row["xla_bf16_ms_per_mm"] / best[0], 3)
    else:
        row["int8_vs_bf16_compute_speedup"] = round(
            row["xla_bf16_ms_per_mm"] / row["pallas_int8_ms_per_mm"], 3)
    return row


def probe(m, k, n):
    rng = np.random.default_rng(0)
    row = {}
    xf = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                     jnp.bfloat16)
    wf = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32),
                     jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
    wq = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))

    row["xla_bf16_ms"] = _time(jax.jit(jax.lax.dot), xf, wf)

    try:
        f_bf16 = jax.jit(functools.partial(
            pallas_matmul, acc_dtype=jnp.float32, out_dtype=jnp.bfloat16))
        row["pallas_bf16_ms"] = _time(f_bf16, xf, wf)
    except Exception as e:  # noqa: BLE001 — record the lowering failure
        row["pallas_bf16_error"] = repr(e)[:300]

    try:
        f_i8 = jax.jit(functools.partial(
            pallas_matmul, acc_dtype=jnp.int32, out_dtype=jnp.int32))
        # correctness vs XLA int32 reference on a small slice
        ref = jax.lax.dot_general(
            xq[:256].astype(jnp.int32), wq[:, :256].astype(jnp.int32),
            (((1,), (0,)), ((), ())))
        got = f_i8(xq, wq)[:256, :256]
        assert np.array_equal(np.asarray(got), np.asarray(ref)), \
            "pallas int8 matmul wrong"
        row["pallas_int8_ms"] = _time(f_i8, xq, wq)
    except Exception as e:  # noqa: BLE001
        row["pallas_int8_error"] = repr(e)[:300]

    if "pallas_int8_ms" in row:
        row["int8_vs_bf16_speedup"] = round(
            row["xla_bf16_ms"] / row["pallas_int8_ms"], 3)
    return row


def main():
    out = {"device": str(jax.devices()[0])}
    for m, k, n in SHAPES_1X1:
        out[f"{m}x{k}x{n}"] = probe(m, k, n)
    out["compute_8192x1024x1024"] = probe_compute(8192, 1024, sweep=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
