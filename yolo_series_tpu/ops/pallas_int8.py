"""Pallas int8 matmul for quantized 1x1 convs (VERDICT r4 next-#3).

XLA on v5e exposes no int8 MXU lowering: an int8xint8->int32 dot_general
compiles to `s32 convolution` wrapped in convert fusions and times ~bf16
(tools/bench_int8.py, PARITY.md "int8 postmortem"). Emitting the matmul
from Pallas DOES reach the int8 MXU path: slope-timed at
(8192x1024)x(1024x1024), blocking (bm,bk,bn)=(1024,1024,256) measures
281 TOPS vs XLA bf16's 190 TOPS — 1.48x (tools/bench_int8_pallas.py,
KERNELS.json int8 rows).

yolov7's deploy-time FLOPs are dominated by 1x1 convs = plain matmuls
over (B*H*W, Cin); this kernel runs them int8xint8->int32 with the
dequantize + bias epilogue fused into the last K step (no second HBM
pass). infer/quant.int8_conv dispatches here for eligible layers
(k=1, s=1, g=1, lane-aligned channels) under YOLO_TPU_PALLAS_INT8=1.

Reference parity: this plays the role of TRT's INT8 engine tactics for
1x1 convs (reference README.md:192-228 reaches int8 through TRT
calibration + kernel selection; calibration here is infer/quant.calibrate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref):
    # K-innermost grid; int32 accumulation in VMEM scratch; dequant +
    # bias epilogue on the last K block
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], w_ref[...],
                            preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = (acc_ref[...].astype(jnp.float32) * s_ref[...]
                      + b_ref[...]).astype(o_ref.dtype)


def _pick_block(dim: int, prefs: tuple) -> int:
    for p in prefs:
        if dim % p == 0:
            return p
    return 0


def int8_matmul_dequant(xq, wq, scale, bias, out_dtype=jnp.float32,
                        bm: int = 0, bk: int = 0, bn: int = 0,
                        interpret: bool = False):
    """(M,K)int8 @ (K,N)int8 -> int32 -> fp: acc * scale[n] + bias[n].

    scale is the combined sx*sw per-output-channel dequant factor (N,),
    bias the fused conv bias (N,). Returns (M, N) out_dtype. M is padded
    to the block size internally; K and N must be 128-multiples (true
    for every quantized yolov7 1x1 conv — channels are 64..1280, and
    eligibility in infer/quant.int8_conv filters the rest).
    """
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2 and scale.shape == (n,) and bias.shape == (n,)
    # blocking tuned on-chip (tools/bench_int8_pallas.py sweep): big M/K
    # blocks, 256-wide N. int8 min tile is (32, 128).
    bk = bk or _pick_block(k, (1024, 512, 256, 128))
    bn = bn or _pick_block(n, (256, 512, 128))
    assert bk and bn, f"K={k}/N={n} not 128-aligned"
    bm = bm or (1024 if m >= 1024 else 256)
    m_pad = (-m) % bm
    if m_pad:
        xq = jnp.pad(xq, ((0, m_pad), (0, 0)))
    grid = ((m + m_pad) // bm, n // bn, k // bk)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                  pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
                  pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
                  pl.BlockSpec((1, bn), lambda i, j, kk: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xq, wq, scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return out[:m] if m_pad else out


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def int8_conv1x1(xq, wq, scale, bias, out_dtype=jnp.float32):
    """NHWC int8 activations x HWIO(1,1,K,N) int8 kernel -> fp NHWC."""
    b, h, w, k = xq.shape
    n = wq.shape[-1]
    y = int8_matmul_dequant(xq.reshape(-1, k), wq.reshape(k, n),
                            scale, bias, out_dtype=out_dtype)
    return y.reshape(b, h, w, n)
