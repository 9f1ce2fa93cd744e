"""Concat-elimination rewrite for the ELAN routing pattern.

Every wide concat in the v7 family (4-way ELAN taps in the backbone,
6-way ELAN-W in the P6 heads, 2-way FPN merges; e.g.
cfg/training/yolov7-w6.yaml — reference trains these as first-class
configs) is consumed ONLY by 1x1 Conv+BN+act layers. On TPU the
concatenate itself is the cost: its inputs are conv outputs whose channel
counts (64/192/320/...) are not 128-lane aligned, so XLA materializes the
concatenated tensor with lane-shift "data formatting" fusions and pads —
profiled at ~31% data-formatting + ~11% pad of the w6 train step, vs 22%
convolutions (PARITY.md "P6 pathology").

The rewrite uses the exact algebraic identity

    conv1x1(concat(x_1..x_n), W) == sum_i conv1x1(x_i, W[off_i:off_i+c_i])

to route the concat's inputs DIRECTLY into each consuming conv: the
consumer computes one small matmul per tap and adds the partial products,
and the concatenated tensor never exists. Parameter/state pytrees are
untouched — the consumer keeps the original full (1,1,sum(c_i),c2) kernel
and its BN, and the per-tap slices are traced ops, so gradients, EMA,
checkpoints, the torch importer/exporter and the optimizer see the exact
same trees. The dead Concat layer stays in the plan and is removed by XLA
dead-code elimination at compile time.

Numerics: the split form changes only the K-reduction order of the 1x1
conv (partial sums per tap instead of one fused reduction) — fp32-level
differences, below the BN rounding-noise floor documented for the ReOrg
fold (PARITY.md).

Reference behavior being re-expressed: models/common.py:56 (Concat)
followed by common.py:99 (Conv); the DSL routings come from
cfg/training/*.yaml.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from yolo_series_tpu.models.graph import GraphPlan
from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.layers import (
    Block, ConvBnAct, batch_norm, conv2d, get_activation)


@dataclasses.dataclass(frozen=True)
class SplitConcatConv(Block):
    """1x1 ConvBnAct applied directly to the un-concatenated route inputs.

    Drop-in plan replacement for a ConvBnAct(k=1, s=1, g=1) whose input was
    a Concat: `apply` receives the concat's input LIST and slices the
    original (1,1,sum(cins),c2) kernel per tap. init() and the param/state
    schema are identical to the ConvBnAct it replaces.
    """

    cins: Tuple[int, ...]
    c2: int
    act: Any = True

    @property
    def cout(self):
        return self.c2

    stride_factor = 1.0

    def init(self, key):
        return ConvBnAct(sum(self.cins), self.c2, 1, 1, None, 1,
                         self.act).init(key)

    def apply(self, params, state, xs, ctx):
        _, fn = get_activation(self.act)
        if ctx.observer is not None or "wq" in params:
            # int8 deploy / calibration observe the conv's ORIGINAL input
            # layout, so these paths keep the explicit concat (observer
            # scales must match what int8_conv will see at runtime)
            x = jnp.concatenate([x.astype(ctx.dtype) for x in xs], axis=-1)
            if ctx.observer is not None:
                ctx.observer(ctx.path, x)
            if "wq" in params:
                from yolo_series_tpu.infer.quant import int8_conv
                y = int8_conv(x.astype(jnp.float32), params["wq"],
                              params["sw"], params["b"], 1, 0, 1,
                              params.get("sx"))
                return fn(y).astype(x.dtype), state
            xs = [x]  # observed eager path: fall through with the concat
            cins = (sum(self.cins),)
        else:
            cins = self.cins
        w = params["w"]
        y = None
        off = 0
        for x_i, ci in zip(xs, cins):
            wi = jax.lax.slice_in_dim(w, off, off + ci, axis=2)
            yi = conv2d(x_i, wi, 1, 0, 1, ctx.dtype)
            y = yi if y is None else y + yi
            off += ci
        if "bn" in params:
            y, bns = batch_norm(params["bn"], state["bn"], y, ctx)
            return fn(y), {"bn": bns}
        y = y + params["b"].astype(y.dtype)
        return fn(y), state


def _refs(spec, j):
    """Absolute input indices consumed by layer j."""
    frm = spec.frm
    if isinstance(frm, tuple):
        return [j - 1 if r == -1 else r for r in frm]
    return [j - 1 if frm == -1 else frm]


def make_split_concat(plan: GraphPlan) -> GraphPlan:
    """Rewrite every Concat whose consumers are ALL 1x1 ConvBnActs: the
    consumers become SplitConcatConv blocks routed straight to the concat's
    inputs. Plan-only (params/state trees unchanged); composes with
    make_train_fast_stem / make_fast_stem / fuse_model in any order.
    Returns the plan unchanged when nothing matches.
    """
    layers = list(plan.layers)
    n = len(layers)
    consumers = {i: [] for i in range(n)}
    for j, spec in enumerate(layers):
        for r in _refs(spec, j):
            if 0 <= r < n:
                consumers[r].append(j)

    new_layers = list(layers)
    extra_save = set()
    changed = False
    for i, spec in enumerate(layers):
        blk = spec.block
        if not isinstance(blk, L.Concat) or spec.is_head or spec.n_seq != 1:
            continue
        cons = consumers[i]
        if not cons:
            continue
        if not all(
            (not layers[j].is_head)
            and isinstance(layers[j].block, ConvBnAct)
            and layers[j].block.k == 1
            and layers[j].block.s == 1
            and layers[j].block.g == 1
            and layers[j].block.p in (None, 0)
            and layers[j].n_seq == 1
            for j in cons
        ):
            continue
        assert isinstance(spec.frm, tuple)
        srcs = tuple(i - 1 if r == -1 else r for r in spec.frm)
        if any(s < 0 for s in srcs):
            continue
        for j in cons:
            conv = new_layers[j].block
            new_layers[j] = dataclasses.replace(
                new_layers[j],
                block=SplitConcatConv(blk.cins, conv.c2, conv.act),
                frm=srcs)
        extra_save.update(srcs)
        changed = True

    if not changed:
        return plan
    return dataclasses.replace(
        plan, layers=tuple(new_layers),
        save=tuple(sorted(set(plan.save) | extra_save)))
