"""Lane-alignment rewrite for unaligned ELAN concats (P6 pathology).

TPU v5e tiles the two minor dims of an NHWC tensor as (8 sublanes, 128
lanes): a conv output with C=64 or C=192 channels is ALREADY physically
padded to 128/256 lanes in HBM/VMEM. A channel concat whose tap
boundaries are not multiples of 128 therefore forces XLA to emit
lane-shift "data formatting" fusions and pads — profiled at ~31%
formatting + ~11% pad of the w6@1280 train step (PARITY.md "P6
pathology"); the round-4 concat-ELIMINATION attack (fastconcat.py)
measured neutral because the shifts moved into the consumers instead of
disappearing.

This pass makes the padding EXPLICIT instead: every ConvBnAct feeding an
unaligned concat gets `ceil(c/128)*128 - c` extra output channels that
are exactly zero (zero-padded kernel + zero BN scale/bias -> zero through
BN in both train and eval mode, and through any f(0)=0 activation), and
every consumer of a padded tensor gets matching zero ROWS inserted into
its kernel. Concat boundaries all land on 128-lane tile edges, so the
concat lowers to whole-tile copies, and no real HBM bytes are added (the
physical layout already held those lanes as hidden pad).

Exactness: padded output channels are identically zero (conv: zero
kernel columns; BN train: batch mean 0 / var 0 -> normalized 0, scaled by
scale=0, shifted by bias=0; BN eval: (0-0)*rsqrt(1+eps)*0+0; SiLU/
LeakyReLU/ReLU/Mish all fix 0), and zero kernel rows make consumers
ignore them. Parameter/state pytrees are UNTOUCHED — padding happens on
traced values inside apply, so gradients, EMA, checkpoints, the torch
importer/exporter and the optimizer see the original trees; running-stat
updates are computed padded and sliced back.

Reference behavior being re-expressed: models/common.py:56 (Concat) of
common.py:99 (Conv) outputs, routed per cfg/training/yolov7-w6.yaml
(e.g. its (64,64,64,64) stride-4 ELAN concat and
(192,192,192,192,384,384) ELAN-W concats).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from yolo_series_tpu.models.graph import GraphPlan
from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.layers import Block, ConvBnAct

LANE = 128

# activations with f(0) == 0: zero pad channels stay zero through them
_ZERO_FIXED_ACTS = {True, False, None, "silu", "relu", "lrelu", "leakyrelu",
                    "mish", "identity", "none"}


def _act_zero_fixed(act) -> bool:
    if isinstance(act, str):
        return act.lower() in _ZERO_FIXED_ACTS
    return act in _ZERO_FIXED_ACTS


def _pad_to_lane(c: int) -> int:
    return (-c) % LANE


@dataclasses.dataclass(frozen=True)
class LaneAlignedConv(Block):
    """ConvBnAct with zero channels inserted in its input and/or appended
    to its output at trace time. Param/state schema identical to `conv`.

    in_segments: ((real, pad), ...) covering the (padded) input layout —
    the real channels of each segment are consumed, the pad channels get
    zero kernel rows. out_pad: zero output channels appended (kernel
    columns, BN scale/bias/mean all zero, var one).
    """

    conv: ConvBnAct
    in_segments: Tuple[Tuple[int, int], ...]
    out_pad: int = 0

    @property
    def cout(self):
        return self.conv.c2 + self.out_pad

    @property
    def stride_factor(self):
        return self.conv.stride_factor

    def init(self, key):
        return self.conv.init(key)

    def _strip_input(self, x):
        """Slice the padded input back to the conv's original channels
        (observer/int8 fallback paths only)."""
        parts, off = [], 0
        for real, pad in self.in_segments:
            parts.append(x[..., off:off + real])
            off += real + pad
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    def apply(self, params, state, x, ctx):
        if ctx.observer is not None or "wq" in params:
            # calibration / int8 deploy run the ORIGINAL conv semantics on
            # the real channels (observer scales must match what int8_conv
            # sees), then re-pad the output — correct, not fast; the
            # serving engine doesn't compose lane_align with int8.
            y, ns = self.conv.apply(params, state, self._strip_input(x), ctx)
            if self.out_pad:
                y = jnp.pad(y, ((0, 0),) * 3 + ((0, self.out_pad),))
            return y, ns

        kh = params["w"].shape[0]
        kw = params["w"].shape[1]
        c2 = self.conv.c2
        w = params["w"]
        if any(p for _, p in self.in_segments):
            parts, off = [], 0
            for real, pad in self.in_segments:
                parts.append(w[:, :, off:off + real])
                off += real
                if pad:
                    parts.append(jnp.zeros((kh, kw, pad, c2), w.dtype))
            w = jnp.concatenate(parts, 2)
        if self.out_pad:
            w = jnp.concatenate(
                [w, jnp.zeros((kh, kw, w.shape[2], self.out_pad), w.dtype)], 3)

        cin_pad = sum(r + p for r, p in self.in_segments)
        inner = dataclasses.replace(self.conv, c1=cin_pad,
                                    c2=c2 + self.out_pad)
        pp = {"w": w}
        ps = state
        if self.out_pad and "bn" in params:
            z = jnp.zeros((self.out_pad,), jnp.float32)
            pp["bn"] = {"scale": jnp.concatenate([params["bn"]["scale"], z]),
                        "bias": jnp.concatenate([params["bn"]["bias"], z])}
            ps = {"bn": {"mean": jnp.concatenate([state["bn"]["mean"], z]),
                         "var": jnp.concatenate(
                             [state["bn"]["var"], jnp.ones_like(z)])}}
        elif "bn" in params:
            pp["bn"] = params["bn"]
        if "b" in params:
            b = params["b"]
            if self.out_pad:
                b = jnp.concatenate([b, jnp.zeros((self.out_pad,), b.dtype)])
            pp["b"] = b
        y, ns = inner.apply(pp, ps, x, ctx)
        if self.out_pad and "bn" in params:
            ns = {"bn": {k: v[:c2] for k, v in ns["bn"].items()}}
        return y, ns


def _refs(spec, j):
    frm = spec.frm
    if isinstance(frm, tuple):
        return [j - 1 if r == -1 else r for r in frm]
    return [j - 1 if frm == -1 else frm]


def _plain_conv(spec) -> bool:
    return (not spec.is_head and spec.n_seq == 1
            and isinstance(spec.block, ConvBnAct) and spec.block.g == 1)


def make_lane_align(plan: GraphPlan) -> GraphPlan:
    """Zero-pad the taps of every lane-misaligned Concat to 128-channel
    multiples and give consumers matching zero kernel rows. Plan-only
    (params/state trees unchanged); exact identity. Returns the plan
    unchanged when every concat is already aligned or a pattern doesn't
    match. Composes with make_train_fast_stem / make_fast_stem."""
    layers = list(plan.layers)
    n = len(layers)
    consumers = {i: [] for i in range(n)}
    for j, spec in enumerate(layers):
        for r in _refs(spec, j):
            if 0 <= r < n:
                consumers[r].append(j)

    out_pad = {}        # layer idx -> pad channels appended
    new_cins = {}       # concat idx -> padded cins
    for i, spec in enumerate(layers):
        blk = spec.block
        if not isinstance(blk, L.Concat) or spec.is_head or spec.n_seq != 1:
            continue
        cins = tuple(blk.cins)
        bounds = [sum(cins[:k]) for k in range(1, len(cins) + 1)]
        if all(b % LANE == 0 for b in bounds):
            continue
        assert isinstance(spec.frm, tuple)
        srcs = tuple(i - 1 if r == -1 else r for r in spec.frm)
        if len(srcs) != len(cins) or any(s < 0 for s in srcs):
            continue
        ok = True
        for s, c in zip(srcs, cins):
            if c % LANE == 0:
                continue
            sp = layers[s]
            if not (_plain_conv(sp) and _act_zero_fixed(sp.block.act)
                    and sp.cout == c):
                ok = False
                break
            # every consumer of a padded tap must be able to absorb the
            # padding: a plain conv (gets zero rows) or THIS concat
            for j in consumers[s]:
                if j != i and not _plain_conv(layers[j]):
                    ok = False
                    break
            if not ok:
                break
        # the concat's consumers must all be plain convs too
        if ok and not all(_plain_conv(layers[j]) for j in consumers[i]):
            ok = False
        if not ok:
            continue
        for s, c in zip(srcs, cins):
            if c % LANE:
                out_pad[s] = _pad_to_lane(c)
        new_cins[i] = tuple(c + (_pad_to_lane(c) if c % LANE else 0)
                            for c in cins)

    if not out_pad:
        return plan

    # input segment descriptor of each rewritten layer's producers
    def _seg_of(r):
        sp = layers[r]
        if r in new_cins:
            return tuple(
                (c, _pad_to_lane(c) if c % LANE else 0)
                for c in layers[r].block.cins)
        return ((sp.cout, out_pad.get(r, 0)),)

    new_layers = list(layers)
    for j, spec in enumerate(layers):
        if isinstance(spec.block, L.Concat):
            if j in new_cins:
                new_layers[j] = dataclasses.replace(
                    spec, block=L.Concat(new_cins[j]),
                    cout=sum(new_cins[j]))
            continue
        refs = _refs(spec, j)
        touched = any(r in out_pad or r in new_cins for r in refs)
        if not touched and j not in out_pad:
            continue
        if touched:
            assert len(refs) == 1 and _plain_conv(spec), (
                f"lane_align: layer {j} consumes padded input but is not a "
                "plain conv")
            segs = _seg_of(refs[0])
        else:
            segs = ((spec.block.c1, 0),)
        pad = out_pad.get(j, 0)
        new_layers[j] = dataclasses.replace(
            spec,
            block=LaneAlignedConv(spec.block, segs, pad),
            cout=spec.block.c2 + pad)
    return dataclasses.replace(plan, layers=tuple(new_layers))
