"""Fast-stem deploy transform: fold the first two convs into phase space.

The first conv of the P5 models (3->32, k3 s1 at full 640px resolution,
cfg yolov7.yaml:15) runs at ~2% MXU utilization on TPU — 3 input channels
and 32 outputs can't fill the 128-lane systolic array, making layer 0
alone ~25% of the whole forward. This transform re-expresses layers 0+1
EXACTLY (pure weight reshuffle, fp32-exact) in stride-2 "phase space":

  layer 0 (k3 s1, C->c0)  ->  k4 s2 conv producing all 4 output phases
                              stacked in channels (C -> 4*c0); the
                              space-to-depth is folded INTO the conv, so
                              no lane-hostile reorg of the 3-channel input
  layer 1 (k3 s2, c0->c1) ->  k2 conv consuming the phase layout with
                              asymmetric (1,0) padding, emitting the
                              standard stride-4 feature map

Downstream layers are untouched. Measured: stem 17.7ms -> 9.7ms per
batch-32 @640 on v5e. Apply AFTER fuse_model (needs {w, b} conv forms).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models.graph import GraphPlan, LayerSpec
from yolo_series_tpu.models.layers import Block, ConvBnAct, conv2d, get_activation

_PHASES = ((0, 0), (1, 0), (0, 1), (1, 1))


@dataclasses.dataclass(frozen=True)
class PhasedConv(Block):
    """Plain fused conv + act with arbitrary kernel/stride/padding."""

    c1: int
    c2: int
    k: Tuple[int, int]
    s: int
    pad: Tuple[Tuple[int, int], Tuple[int, int]]
    act: Any = True

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    def init(self, key):
        raise NotImplementedError("PhasedConv params come from the transform")

    def apply(self, params, state, x, ctx):
        y = conv2d(x, params["w"], self.s, list(self.pad), 1, ctx.dtype)
        y = y + params["b"].astype(y.dtype)
        _, fn = get_activation(self.act)
        return fn(y), state


def _phase_weights(w0: np.ndarray, b0: np.ndarray, w1: np.ndarray):
    """(3,3,C,c0), (c0,), (3,3,c0,c1) -> k4 and k2 phase kernels."""
    c_in, c0 = w0.shape[2], w0.shape[3]
    c1 = w1.shape[3]
    w4 = np.zeros((4, 4, c_in, 4 * c0), np.float32)
    for pi, (a, b) in enumerate(_PHASES):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                w4[a + dy + 1, b + dx + 1, :, pi * c0:(pi + 1) * c0] = \
                    w0[dy + 1, dx + 1]
    b4 = np.tile(b0, 4)
    w2 = np.zeros((2, 2, 4 * c0, c1), np.float32)
    for ci, (c, d) in enumerate(_PHASES):
        for r in range(2):
            for s in range(2):
                dy = 2 * r + c - 2
                dx = 2 * s + d - 2
                if -1 <= dy <= 1 and -1 <= dx <= 1:
                    w2[r, s, ci * c0:(ci + 1) * c0, :] = w1[dy + 1, dx + 1]
    return w4, b4, w2


def _pair_matches(plan, params, i):
    layers = plan.layers
    if i + 1 >= len(layers) or layers[i].is_head or layers[i + 1].is_head:
        return False
    l0, l1 = layers[i].block, layers[i + 1].block
    p0, p1 = params["layers"][i], params["layers"][i + 1]
    return (isinstance(l0, ConvBnAct) and isinstance(l1, ConvBnAct)
            and l0.k == 3 and l0.s == 1 and l1.k == 3 and l1.s == 2
            and l0.g == 1 and l1.g == 1 and l0.p is None and l1.p is None
            and isinstance(p0, dict) and isinstance(p1, dict)
            and "w" in p0 and "b" in p0 and "w" in p1 and "b" in p1
            and layers[i].frm == -1 and layers[i + 1].frm == -1
            and i not in plan.save)


def make_fast_stem(plan: GraphPlan, params, state, max_pairs: int = 1):
    """Fold up to `max_pairs` consecutive (k3/s1, k3/s2) conv pairs into
    phase space, scanning from layer 0. Returns the inputs unchanged when
    no pair matches (non-P5 stem / unfused params)."""
    new_layers = list(plan.layers)
    lp = list(params["layers"])
    folded = 0
    i = 0
    while i + 1 < len(new_layers) and folded < max_pairs:
        if not _pair_matches(dataclasses.replace(plan, layers=tuple(new_layers)),
                             {"layers": lp}, i):
            i += 1
            continue
        l0, l1 = new_layers[i].block, new_layers[i + 1].block
        p0, p1 = lp[i], lp[i + 1]
        w4, b4, w2 = _phase_weights(np.asarray(p0["w"], np.float32),
                                    np.asarray(p0["b"], np.float32),
                                    np.asarray(p1["w"], np.float32))
        blk0 = PhasedConv(l0.c1, 4 * l0.c2, (4, 4), 2, ((1, 1), (1, 1)), l0.act)
        blk1 = PhasedConv(4 * l0.c2, l1.c2, (2, 2), 1, ((1, 0), (1, 0)), l1.act)
        new_layers[i] = dataclasses.replace(new_layers[i], block=blk0,
                                            cout=4 * l0.c2,
                                            stride=new_layers[i].stride * 2)
        new_layers[i + 1] = dataclasses.replace(new_layers[i + 1], block=blk1)
        lp[i] = {"w": jnp.asarray(w4), "b": jnp.asarray(b4)}
        lp[i + 1] = {"w": jnp.asarray(w2), "b": jnp.asarray(p1["b"])}
        folded += 1
        i += 2
    if folded == 0:
        return plan, params, state
    return (dataclasses.replace(plan, layers=tuple(new_layers)),
            {**params, "layers": lp}, state)
