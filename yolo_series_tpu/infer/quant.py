"""INT8 quantized inference — the TensorRT-INT8 path equivalent.

The reference reaches INT8 through TRT calibration (README.md:192-228,
external tensorrt-python). Here quantization is a pure pytree transform on
the FUSED deploy params (models/reparam.fuse_model first):

  * weights: per-output-channel symmetric int8 (scale = absmax / 127);
  * activations: per-tensor symmetric int8 with scales baked from a
    calibration pass (`calibrate`) over representative batches — absmax or
    percentile observers; falls back to in-graph dynamic scales when no
    calibration is provided;
  * convs run int8 x int8 -> int32 on the MXU
    (lax.conv_general_dilated with preferred_element_type=int32),
    dequantize + bias + activation fused after.

The quantized tree swaps {w} -> {wq, sw[, sx]} and the standard block
apply functions (models/layers.py) take the int8 path automatically.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models import heads as H
from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.graph import GraphPlan


def quantize_weight(w: jnp.ndarray):
    """HWIO fp32 -> (int8 weights, per-out-channel scale (O,))."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    sw = jnp.maximum(absmax / 127.0, 1e-8)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _quantize_conv_leaf(params: Dict[str, Any], act_scale=None):
    assert "w" in params and "b" in params, "quantize fused params only"
    wq, sw = quantize_weight(params["w"])
    out = {"wq": wq, "sw": sw, "b": params["b"]}
    if act_scale is not None:
        out["sx"] = jnp.asarray(act_scale, jnp.float32)
    return out


def pallas_1x1_eligible(block) -> bool:
    """True when ops/pallas_int8.int8_conv1x1 will take this conv: 1x1,
    stride 1, no groups, 128-aligned channels (the int8 MXU kernel's
    lane constraints)."""
    k = getattr(block, "k", None)
    s = getattr(block, "s", 1)
    g = getattr(block, "g", 1)
    c1 = getattr(block, "c1", 0)
    c2 = getattr(block, "c2", 0)
    return (k == 1 and s in (1, (1, 1)) and g == 1
            and c1 % 128 == 0 and c2 % 128 == 0)


def quantize_tree(block, params, act_scales: Optional[Dict[int, float]] = None,
                  _path="", mixed: bool = False):
    """Recursively quantize conv leaves of a fused param tree. With
    mixed=True, quantize ONLY the Pallas-int8-eligible 1x1 convs (the
    FLOPs majority) and keep the rest bf16 — the per-layer tactic
    selection TRT's INT8 builder does (reference README.md:192-228)."""
    if isinstance(block, (L.ConvBnAct, L.Focus, L.RepConv, L.PlainConv)):
        if mixed and not pallas_1x1_eligible(block):
            return params
        scale = act_scales.get(_path) if act_scales else None
        return _quantize_conv_leaf(params, scale)
    if isinstance(block, L.Composite):
        out = {}
        for name, child in block.children().items():
            out[name] = quantize_tree(child, params[name], act_scales,
                                      f"{_path}/{name}", mixed=mixed)
        return out
    return params


def quantize_model(plan: GraphPlan, params, state,
                   act_scales: Optional[Dict[str, float]] = None,
                   mixed: bool = False):
    """Quantize a FUSED model's conv weights; heads stay fp (the reference
    TRT engines also keep the detect layer fp16, export_onnx.py).
    mixed=True -> only Pallas-int8-eligible 1x1 convs (see quantize_tree)."""
    lp = params["layers"]
    new = []
    for idx, spec in enumerate(plan.layers):
        if spec.is_head:
            new.append(lp[idx])
        elif spec.n_seq > 1:
            new.append([quantize_tree(spec.block, lp[idx][r], act_scales,
                                      f"l{idx}.{r}", mixed=mixed)
                        for r in range(spec.n_seq)])
        else:
            new.append(quantize_tree(spec.block, lp[idx], act_scales,
                                     f"l{idx}", mixed=mixed))
    return {"layers": new}, state


def _pallas_int8_enabled() -> bool:
    import os
    return os.environ.get("YOLO_TPU_PALLAS_INT8", "1") == "1"


def int8_conv(x, wq, sw, b, stride, padding, groups, sx=None):
    """Quantized conv: int8 x int8 -> int32, dequant, bias.

    x: fp activations; sx: static per-tensor scale (calibrated) or None for
    in-graph dynamic absmax.

    1x1/s1/g1 lane-aligned convs (the FLOPs majority) dispatch to the
    Pallas int8 MXU matmul (ops/pallas_int8.py, 1.48x XLA bf16 — XLA
    itself has no int8 MXU lowering on v5e); everything else takes the
    XLA int8 conv. Opt out with YOLO_TPU_PALLAS_INT8=0.
    """
    if sx is None:
        sx = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-8))
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    kh, kw, kc, n = wq.shape
    if (kh == 1 and kw == 1 and groups == 1 and x.ndim == 4
            and (stride == 1 or stride == (1, 1))
            and kc % 128 == 0 and n % 128 == 0
            and jax.devices()[0].platform == "tpu"
            and _pallas_int8_enabled()):
        from yolo_series_tpu.ops.pallas_int8 import int8_conv1x1
        return int8_conv1x1(xq, wq, sx * sw, jnp.asarray(b, jnp.float32),
                            out_dtype=jnp.float32)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    elif isinstance(padding, (tuple, list)) and padding and isinstance(padding[0], int):
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        pad = padding
    dn = jax.lax.conv_dimension_numbers(xq.shape, wq.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride), padding=pad,
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw) + b
    return y


def calibrate(plan: GraphPlan, params, state, batches: Sequence[np.ndarray],
              percentile: float = 99.99) -> Dict[str, float]:
    """Collect per-conv-LEAF input activation scales over calibration
    batches — the calibration role of TRT's Int8EntropyCalibrator.

    Runs the fp model EAGERLY with the Ctx.observer hook, which fires at
    every conv input with the same paths quantize_tree uses ("l3",
    "l5/cv1", "l7.0/cv2", ...), so every quantized conv gets a static
    scale and the int8 serving graph contains NO dynamic absmax
    reductions. Returns {path: scale} for quantize_model.
    """
    from yolo_series_tpu.models.model import apply_model

    records: Dict[str, List[float]] = {}

    def observe(path, x):
        v = float(np.percentile(np.abs(np.asarray(x)), percentile))
        records.setdefault(path, []).append(v)

    for xb in batches:
        apply_model(plan, params, state, jnp.asarray(xb, jnp.float32),
                    training=False, dtype=jnp.float32, observer=observe)
    return {k: max(max(v) / 127.0, 1e-8) for k, v in records.items()}
