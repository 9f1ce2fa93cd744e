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


def _phase_w4(w0):
    """(3,3,C,c0) original k3 weights -> (4,4,C,4*c0) phase kernel, as a
    traced (differentiable) op: gradients flow back to w0, so training in
    phase space is SGD-equivalent to the standard stem."""
    c_in, c0 = w0.shape[2], w0.shape[3]
    w4 = jnp.zeros((4, 4, c_in, 4, c0), w0.dtype)
    for pi, (a, b) in enumerate(_PHASES):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                w4 = w4.at[a + dy + 1, b + dx + 1, :, pi, :].set(w0[dy + 1, dx + 1])
    return w4.reshape(4, 4, c_in, 4 * c0)


def _phase_w2(w1):
    """(3,3,c0,c1) -> (2,2,4*c0,c1) phase-consuming kernel (traced)."""
    c0, c1 = w1.shape[2], w1.shape[3]
    w2 = jnp.zeros((2, 2, 4, c0, c1), w1.dtype)
    for ci, (c, d) in enumerate(_PHASES):
        for r in range(2):
            for s in range(2):
                dy = 2 * r + c - 2
                dx = 2 * s + d - 2
                if -1 <= dy <= 1 and -1 <= dx <= 1:
                    w2 = w2.at[r, s, ci, :, :].set(w1[dy + 1, dx + 1])
    return w2.reshape(2, 2, 4 * c0, c1)


@dataclasses.dataclass(frozen=True)
class TrainPhasedConvA(Block):
    """Training-time phase-folded k3/s1 ConvBnAct (the pair's first conv).

    Params/state keep the ORIGINAL ConvBnAct shapes ({w (3,3,c1,c2), bn},
    bn state (c2,)) so checkpoints, EMA, optimizer groups and the torch
    exporter are untouched; only the computation changes: the k4/s2 phase
    conv emits all 4 output phases channel-stacked (c2 -> 4*c2, full
    128-lane tiles instead of the lane-starved 640px x 32ch map — profiled
    at ~180 GB/s, 22% of HBM peak, in the standard form). BN statistics
    aggregate over the phase axis, which IS the original spatial reduce."""

    c1: int
    c2: int
    act: Any = True

    @property
    def cout(self):
        return 4 * self.c2

    stride_factor = 2.0

    def init(self, key):
        return ConvBnAct(self.c1, self.c2, 3, 1, None, 1, self.act).init(key)

    def apply(self, params, state, x, ctx):
        from yolo_series_tpu.models.layers import BN_EPS, BN_MOMENTUM

        w4 = _phase_w4(params["w"])
        y = conv2d(x, w4, 2, ((1, 1), (1, 1)), 1, ctx.dtype)
        bnp, bns = params["bn"], state["bn"]
        if ctx.training:
            yf = y.astype(jnp.float32)
            b_, h_, w_, _ = y.shape
            c2 = self.c2
            m0 = jax.lax.stop_gradient(jnp.tile(bns["mean"], 4))
            yc = yf - m0
            r = yc.reshape(b_, h_, w_, 4, c2)
            mc = jnp.mean(r, axis=(0, 1, 2, 3))
            msq = jnp.mean(jnp.square(r), axis=(0, 1, 2, 3))
            if ctx.axis_name is not None:
                mc = jax.lax.pmean(mc, ctx.axis_name)
                msq = jax.lax.pmean(msq, ctx.axis_name)
            mean = bns["mean"] + mc
            var = jnp.maximum(msq - jnp.square(mc), 0.0)
            n = b_ * h_ * w_ * 4
            if ctx.axis_name is not None:
                n = n * jax.lax.psum(1, ctx.axis_name)
            unbiased = var * (n / max(n - 1, 1))
            new_bns = {"mean": (1 - BN_MOMENTUM) * bns["mean"] + BN_MOMENTUM * mean,
                       "var": (1 - BN_MOMENTUM) * bns["var"] + BN_MOMENTUM * unbiased}
        else:
            mean, var = bns["mean"], bns["var"]
            new_bns = bns
        inv = jax.lax.rsqrt(var + BN_EPS) * bnp["scale"]
        # tiled (4*c2) scale/shift: full-lane elementwise in phase layout
        yn = (y.astype(jnp.float32) - jnp.tile(mean, 4)) * jnp.tile(inv, 4) \
            + jnp.tile(bnp["bias"], 4)
        _, fn = get_activation(self.act)
        return fn(yn).astype(y.dtype), {"bn": new_bns}


@dataclasses.dataclass(frozen=True)
class TrainPhasedConvB(Block):
    """Training-time phase-consuming k3/s2 ConvBnAct (the pair's second
    conv): k2/s1 conv over the phase layout with asymmetric (1,0) padding,
    emitting the standard stride-2 map. Params/state = original ConvBnAct."""

    c1: int
    c2: int
    act: Any = True

    @property
    def cout(self):
        return self.c2

    stride_factor = 1.0

    def init(self, key):
        return ConvBnAct(self.c1, self.c2, 3, 2, None, 1, self.act).init(key)

    def apply(self, params, state, x, ctx):
        from yolo_series_tpu.models.layers import batch_norm

        w2 = _phase_w2(params["w"])
        y = conv2d(x, w2, 1, ((1, 0), (1, 0)), 1, ctx.dtype)
        y, new_bns = batch_norm(params["bn"], state["bn"], y, ctx)
        _, fn = get_activation(self.act)
        return fn(y), {"bn": new_bns}


@dataclasses.dataclass(frozen=True)
class _Passthrough(Block):
    """Replaces a folded-away ReOrg: forwards x unchanged (the fold moved
    the space-to-depth INTO the next conv's kernel)."""

    c1: int

    @property
    def cout(self):
        return self.c1

    stride_factor = 1.0

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return x, state


# ReOrg phase order (models/layers.py ReOrg == reference common.py:48):
# (row, col) offsets per channel block
_REORG_PHASES = ((0, 0), (1, 0), (0, 1), (1, 1))


def _reorg_w6(w3):
    """(3,3,4*C,c1) conv-after-ReOrg kernel -> (6,6,C,c1) stride-2 kernel
    on the RAW image (traced, differentiable): tap (2*di+a, 2*dj+b) of the
    6x6 kernel carries w3[di+1, dj+1, p*C+cin] for phase p=(a, b). ReOrg
    then conv3x3/s1/pad1 == conv6x6/s2/pad2 exactly (incl. zero padding:
    phase-pixel -1 is original rows -2/-1)."""
    c4, c1 = w3.shape[2], w3.shape[3]
    c_in = c4 // 4
    w6 = jnp.zeros((6, 6, c_in, c1), w3.dtype)
    for p, (a, b) in enumerate(_REORG_PHASES):
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                w6 = w6.at[2 * di + a + 2, 2 * dj + b + 2, :, :].set(
                    w3[di + 1, dj + 1, p * c_in:(p + 1) * c_in, :])
    return w6


@dataclasses.dataclass(frozen=True)
class TrainReorgConv(Block):
    """Training-time fold of [ReOrg, ConvBnAct(4c->c2, k3, s1)] (the P6
    stem, cfg/training/yolov7-w6.yaml:16-17) into ONE 6x6/s2 conv on the
    raw image. The ReOrg strided slices are layout-hostile on TPU
    (profiled: 4 x 3.7 ms 'custom fusion' fwd + mirrors in bwd at
    1280px); the fold removes them entirely. Params/state stay the
    original ConvBnAct's ({w (3,3,4c,c2), bn}) — the kernel reshuffle is
    traced, so gradients/EMA/checkpoints are untouched."""

    c1: int     # raw input channels (3)
    c2: int
    act: Any = True

    @property
    def cout(self):
        return self.c2

    stride_factor = 2.0

    def init(self, key):
        return ConvBnAct(4 * self.c1, self.c2, 3, 1, None, 1, self.act).init(key)

    def apply(self, params, state, x, ctx):
        from yolo_series_tpu.models.layers import batch_norm

        w6 = _reorg_w6(params["w"])
        y = conv2d(x, w6, 2, ((2, 2), (2, 2)), 1, ctx.dtype)
        y, new_bns = batch_norm(params["bn"], state["bn"], y, ctx)
        _, fn = get_activation(self.act)
        return fn(y), {"bn": new_bns}


def _train_pair_matches(plan, i):
    layers = plan.layers
    if i + 1 >= len(layers) or layers[i].is_head or layers[i + 1].is_head:
        return False
    l0, l1 = layers[i].block, layers[i + 1].block
    return (isinstance(l0, ConvBnAct) and isinstance(l1, ConvBnAct)
            and l0.k == 3 and l0.s == 1 and l1.k == 3 and l1.s == 2
            and l0.g == 1 and l1.g == 1 and l0.p is None and l1.p is None
            and layers[i].n_seq == 1 and layers[i + 1].n_seq == 1
            and layers[i].frm == -1 and layers[i + 1].frm == -1
            and i not in plan.save)


def make_train_fast_stem(plan: GraphPlan, max_pairs: int = 2) -> GraphPlan:
    """Rewrite up to `max_pairs` (k3/s1, k3/s2) ConvBnAct pairs from layer 0
    into phase-space TRAINING blocks. Params/state trees are unchanged —
    only the plan differs — so this composes with checkpoints, EMA and the
    optimizer transparently. Returns the plan unchanged if nothing matches
    (P6 stems start with ReOrg)."""
    from yolo_series_tpu.models.layers import ReOrg

    new_layers = list(plan.layers)
    folded = 0
    i = 0
    # P6 stems: [ReOrg, Conv(4c -> c2, k3, s1)] folds to one 6x6/s2 conv
    l0 = new_layers[0].block
    if (len(new_layers) > 1 and isinstance(l0, ReOrg)
            and isinstance(new_layers[1].block, ConvBnAct)
            and new_layers[1].block.k == 3 and new_layers[1].block.s == 1
            and new_layers[1].block.g == 1 and new_layers[1].block.p is None
            and new_layers[0].frm == -1 and new_layers[1].frm == -1
            and 0 not in plan.save and new_layers[1].n_seq == 1):
        c_raw = l0.c1
        conv = new_layers[1].block
        new_layers[0] = dataclasses.replace(
            new_layers[0], block=_Passthrough(c_raw), cout=c_raw,
            stride=new_layers[0].stride / 2)
        new_layers[1] = dataclasses.replace(
            new_layers[1], block=TrainReorgConv(c_raw, conv.c2, conv.act))
        folded += 1
        i = 2
    while i + 1 < len(new_layers) and folded < max_pairs:
        probe = dataclasses.replace(plan, layers=tuple(new_layers))
        if not _train_pair_matches(probe, i):
            i += 1
            continue
        l0, l1 = new_layers[i].block, new_layers[i + 1].block
        new_layers[i] = dataclasses.replace(
            new_layers[i], block=TrainPhasedConvA(l0.c1, l0.c2, l0.act),
            cout=4 * l0.c2, stride=new_layers[i].stride * 2)
        new_layers[i + 1] = dataclasses.replace(
            new_layers[i + 1], block=TrainPhasedConvB(4 * l0.c2, l1.c2, l1.act))
        folded += 1
        i += 2
    if folded == 0:
        return plan
    return dataclasses.replace(plan, layers=tuple(new_layers))


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
