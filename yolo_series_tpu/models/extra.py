"""Long-tail block zoo: robust/cross/mix convs, weighted Sum, Ghost
variants, and the OREPA re-parameterization family.

Parity targets: RobustConv/RobustConv2 (reference common.py:114-144),
CrossConv/Sum/MixConv2d (experimental.py:10-66), GhostSPPCSPC
(common.py:282-293), GhostStem (common.py:296-304), ConvBN
(common.py:1038-1070), OREPA_3x3_RepConv 6-branch einsum weight generator
(common.py:1072-1222), RepConv_OREPA (common.py:1224-1360).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models.layers import (
    Block, Composite, Ctx, ConvBnAct, GhostConv, Stem, SPPCSPC,
    autopad, batch_norm, bn_init, conv2d, conv_kernel_init, conv_bias_init,
    get_activation, max_pool, _pair,
)
from yolo_series_tpu.models.reparam import fuse_conv_bn


@dataclasses.dataclass(frozen=True)
class RobustConv(Composite):
    """Large-kernel depthwise + 1x1 with layer scale (common.py:114-128)."""

    c1: int
    c2: int
    k: int = 7
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Any = True
    layer_scale: float = 1e-6

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    def children(self):
        return {"conv_dw": ConvBnAct(self.c1, self.c1, self.k, self.s,
                                     self.p, self.c1, self.act)}

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state = Composite.init(self, k1)
        ka, kb = jax.random.split(k2)
        params["conv1x1"] = {
            "w": conv_kernel_init(ka, 1, 1, self.c1, self.c2),
            "b": conv_bias_init(kb, self.c2, self.c1)}
        if self.layer_scale > 0:
            params["gamma"] = jnp.full((self.c2,), self.layer_scale, jnp.float32)
        return params, state

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y = call("conv_dw", x)
        y = conv2d(y, params["conv1x1"]["w"], 1, 0, 1, ctx.dtype)
        y = y + params["conv1x1"]["b"].astype(y.dtype)
        if "gamma" in params:
            y = y * params["gamma"].astype(y.dtype)
        return y, ns


@dataclasses.dataclass(frozen=True)
class RobustConv2(Composite):
    """Strided depthwise + transpose-conv upsample path
    (common.py:131-144)."""

    c1: int
    c2: int
    k: int = 7
    s: int = 4
    p: Optional[int] = None
    g: int = 1
    act: Any = True
    layer_scale: float = 1e-6

    @property
    def cout(self):
        return self.c2

    # strided conv downsamples by s, transpose conv upsamples by s
    stride_factor = 1.0

    def children(self):
        return {"conv_strided": ConvBnAct(self.c1, self.c1, self.k, self.s,
                                          self.p, self.c1, self.act)}

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state = Composite.init(self, k1)
        ka, kb = jax.random.split(k2)
        fan_in = self.c1 * self.s * self.s
        bound = 1.0 / math.sqrt(fan_in)
        params["deconv"] = {
            "w": jax.random.uniform(ka, (self.s, self.s, self.c1, self.c2),
                                    jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (self.c2,), jnp.float32, -bound, bound)}
        if self.layer_scale > 0:
            params["gamma"] = jnp.full((self.c2,), self.layer_scale, jnp.float32)
        return params, state

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y = call("conv_strided", x)
        w = params["deconv"]["w"].astype(ctx.dtype)
        y = jax.lax.conv_transpose(
            y.astype(ctx.dtype), w, strides=(self.s, self.s), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + params["deconv"]["b"].astype(y.dtype)
        if "gamma" in params:
            y = y * params["gamma"].astype(y.dtype)
        return y, ns


@dataclasses.dataclass(frozen=True)
class CrossConv(Composite):
    """(1,k) then (k,1) factored conv (experimental.py:10-22)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    def children(self):
        # stride is factored with the kernel: (1,k)@(1,s) then (k,1)@(s,1)
        # (experimental.py:15-16)
        c_ = int(self.c2 * self.e)
        return {
            "cv1": ConvBnAct(self.c1, c_, (1, self.k), (1, self.s)),
            "cv2": ConvBnAct(c_, self.c2, (self.k, 1), (self.s, 1), None, self.g),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y = call("cv2", call("cv1", x))
        if self.shortcut and self.c1 == self.c2:
            y = x + y
        return y, ns


@dataclasses.dataclass(frozen=True)
class Sum(Block):
    """(Weighted) sum of n inputs (experimental.py:25-44, BiFPN-style)."""

    cins: Tuple[int, ...]
    weight: bool = False

    @property
    def cout(self):
        return self.cins[0]

    def init(self, key):
        n = len(self.cins)
        if self.weight:
            return {"w": -jnp.arange(1.0, n) / 2.0}, {}
        return {}, {}

    def apply(self, params, state, xs, ctx):
        y = xs[0]
        if self.weight:
            w = jax.nn.sigmoid(params["w"]) * 2.0
            for i, xi in enumerate(xs[1:]):
                y = y + xi * w[i].astype(xi.dtype)
        else:
            for xi in xs[1:]:
                y = y + xi
        return y, state


@dataclasses.dataclass(frozen=True)
class MixConv2d(Block):
    """Mixed-kernel conv groups + BN + LeakyReLU + residual
    (experimental.py:47-66)."""

    c1: int
    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1
    equal_ch: bool = True

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    def _splits(self):
        groups = len(self.k)
        idx = np.floor(np.linspace(0, groups - 1e-6, self.c2)).astype(int)
        return [int((idx == g).sum()) for g in range(groups)]

    def init(self, key):
        keys = jax.random.split(key, len(self.k))
        ws = {f"m{i}": {"w": conv_kernel_init(keys[i], k, k, self.c1, c_)}
              for i, (k, c_) in enumerate(zip(self.k, self._splits()))}
        bnp, bns = bn_init(self.c2)
        ws["bn"] = bnp
        return ws, {"bn": bns}

    def apply(self, params, state, x, ctx):
        outs = []
        for i, k in enumerate(self.k):
            outs.append(conv2d(x, params[f"m{i}"]["w"], self.s, k // 2, 1,
                               ctx.dtype))
        y = jnp.concatenate(outs, -1)
        y, bns = batch_norm(params["bn"], state["bn"], y, ctx)
        y = jax.nn.leaky_relu(y, 0.1)
        return x + y, {"bn": bns}


class GhostSPPCSPC(SPPCSPC):
    """SPPCSPC with GhostConv stems (common.py:282-293)."""

    def children(self):
        c_ = int(2 * self.c2 * self.e)
        return {
            "cv1": GhostConv(self.c1, c_, 1, 1),
            "cv2": GhostConv(self.c1, c_, 1, 1),
            "cv3": GhostConv(c_, c_, 3, 1),
            "cv4": GhostConv(c_, c_, 1, 1),
            "cv5": GhostConv(4 * c_, c_, 1, 1),
            "cv6": GhostConv(c_, c_, 3, 1),
            "cv7": GhostConv(2 * c_, self.c2, 1, 1),
        }


class GhostStem(Stem):
    """Stem with GhostConv stages (common.py:296-304)."""

    def children(self):
        c_ = int(self.c2 / 2)
        return {
            "cv1": GhostConv(self.c1, c_, 3, 2),
            "cv2": GhostConv(c_, c_, 1, 1),
            "cv3": GhostConv(c_, c_, 3, 2),
            "cv4": GhostConv(2 * c_, self.c2, 1, 1),
        }


# ---------------------------------------------------------------------------
# OREPA family


def _fre_prior(out_channels: int, k: int = 3) -> np.ndarray:
    """Fixed frequency prior (reference fre_init, common.py:1160-1171)."""
    t = np.zeros((out_channels, k, k), np.float32)
    half = out_channels / 2
    for i in range(out_channels):
        for h in range(k):
            for w in range(k):
                if i < half:
                    t[i, h, w] = math.cos(math.pi * (h + 0.5) * (i + 1) / 3)
                else:
                    t[i, h, w] = math.cos(math.pi * (w + 0.5) * (i + 1 - half) / 3)
    return t


@dataclasses.dataclass(frozen=True)
class OREPA3x3(Block):
    """OREPA 3x3 re-param conv: the weight is GENERATED each step as a
    vector-gated sum of 6 structural branches (origin / avg / freq-prior /
    1x1-kxk / depthwise-sep / identity), then used in ONE conv + BN
    (reference OREPA_3x3_RepConv weight_gen, common.py:1173-1222). Deploying
    collapses weight_gen + BN into a plain {w, b} conv.
    """

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = None
    expand: int = 8

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    @property
    def has_identity(self):
        return self.c1 == self.c2 and self.s == 1

    def init(self, key):
        keys = jax.random.split(key, 6)
        cig = self.c1 // self.g
        k = self.k
        # `vector` matches the reference row count, INCLUDING the phantom
        # identity row: reference common.py:1146-1147 bumps branch_counter
        # when c1==c2 and s==1 and allocates a vector row for it, but
        # weight_gen (common.py:1180-1209) never reads it. Row 5 is dead
        # weight kept for param-structure parity (init 0; ref leaves it
        # uninitialized memory).
        n_branch = 5 + (1 if self.has_identity else 0)
        vec = [0.25, 0.25, 0.0, 0.5, 0.5] + [0.0] * (n_branch - 5)
        # kxk_1x1 holds the EFFECTIVE internal matrix: reference stores a
        # zero-init deviation plus a fixed identity buffer
        # (idconv1 + id_tensor, common.py:1122-1129); the sum is what
        # weight_gen consumes, so we parameterize the sum directly and
        # identity-initialize it.
        eye = np.zeros((1, 1, cig, self.c1), np.float32)
        for t in range(self.c1):
            eye[0, 0, t % cig, t] = 1.0
        params = {
            "origin": conv_kernel_init(keys[0], k, k, cig, self.c2),
            "avg_conv": conv_kernel_init(keys[1], 1, 1, cig, self.c2),
            "pfir_conv": conv_kernel_init(keys[2], 1, 1, cig, self.c2),
            "kxk_1x1": jnp.asarray(eye),
            "kxk_kxk": conv_kernel_init(keys[4], k, k, self.c1 // self.g, self.c2),
            "dw": conv_kernel_init(keys[5], k, k, 1, self.c1 * self.expand),
            "pw": conv_kernel_init(jax.random.fold_in(key, 9), 1, 1,
                                   self.c1 * self.expand, self.c2),
            "vector": jnp.stack([jnp.full((self.c2,), v) for v in vec]),
        }
        bnp, bns = bn_init(self.c2)
        params["bn"] = bnp
        return params, {"bn": bns}

    def weight_gen(self, params):
        """Compose the effective HWIO kernel (5 live branches,
        common.py:1180-1209; the identity vector row is never used)."""
        k = self.k
        v = params["vector"]
        w = params["origin"] * v[0]
        avg = jnp.full((k, k, 1, 1), 1.0 / (k * k))
        w = w + params["avg_conv"] * avg * v[1]
        prior = jnp.asarray(_fre_prior(self.c2, k)).transpose(1, 2, 0)  # (k,k,O)
        w = w + params["pfir_conv"] * prior[:, :, None, :] * v[2]
        # 1x1 -> kxk composition: einsum over the internal channel
        w_kxk = jnp.einsum("ab,hwbo->hwao", params["kxk_1x1"][0, 0],
                           params["kxk_kxk"])
        w = w + w_kxk * v[3]
        # depthwise (k,k,1,C*E) + pointwise (1,1,C*E,O) -> dense (k,k,C,O)
        dw = params["dw"].reshape(k, k, self.c1, self.expand)
        w_dws = jnp.einsum("hwce,ceo->hwco", dw,
                           dw_pw_reshape(params["pw"], self.c1, self.expand))
        w = w + w_dws * v[4]
        return w

    def apply(self, params, state, x, ctx):
        _, fn = get_activation(self.act if self.act is not None else False)
        if "w" in params:  # deployed
            y = conv2d(x, params["w"], self.s, self.k // 2, self.g, ctx.dtype)
            return fn(y + params["b"].astype(y.dtype)), state
        w = self.weight_gen(params)
        y = conv2d(x, w, self.s, self.k // 2, self.g, ctx.dtype)
        y, bns = batch_norm(params["bn"], state["bn"], y, ctx)
        return fn(y), {"bn": bns}

    def deploy(self, params, state):
        w = self.weight_gen(params)
        w, b = fuse_conv_bn(w, params["bn"], state["bn"])
        return {"w": w, "b": b}, {}


def dw_pw_reshape(pw, c1, expand):
    """(1,1,C*E,O) pointwise -> (C, E, O) grouped view for dws composition."""
    o = pw.shape[-1]
    return pw[0, 0].reshape(c1, expand, o)


@dataclasses.dataclass(frozen=True)
class RepConvOREPA(Composite):
    """RepConv with an OREPA 3x3 branch + 1x1 ConvBN branch + identity BN
    (reference RepConv_OREPA, common.py:1224-1360)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Any = True

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    @property
    def has_identity(self):
        return self.c1 == self.c2 and self.s == 1

    def children(self):
        kids = {
            "rbr_dense": OREPA3x3(self.c1, self.c2, 3, self.s, self.g),
        }
        return kids

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state = Composite.init(self, k1)
        params["rbr_1x1"] = {"w": conv_kernel_init(k2, 1, 1,
                                                   self.c1 // self.g, self.c2)}
        bnp, bns = bn_init(self.c2)
        params["rbr_1x1"]["bn"] = bnp
        state["rbr_1x1"] = {"bn": bns}
        if self.has_identity:
            idp, ids = bn_init(self.c1)
            params["idbn"] = idp
            state["idbn"] = ids
        return params, state

    def apply(self, params, state, x, ctx):
        _, fn = get_activation(self.act)
        if "w" in params:  # deployed single conv
            y = conv2d(x, params["w"], self.s, 1, self.g, ctx.dtype)
            return fn(y + params["b"].astype(y.dtype)), state
        new_state = dict(state)
        y1, s1 = self.children()["rbr_dense"].apply(
            params["rbr_dense"], state["rbr_dense"], x, ctx)
        new_state["rbr_dense"] = s1
        y2 = conv2d(x, params["rbr_1x1"]["w"], self.s, 0, self.g, ctx.dtype)
        y2, s2 = batch_norm(params["rbr_1x1"]["bn"], state["rbr_1x1"]["bn"],
                            y2, ctx)
        new_state["rbr_1x1"] = {"bn": s2}
        y = y1 + y2
        if self.has_identity:
            y3, s3 = batch_norm(params["idbn"], state["idbn"], x, ctx)
            new_state["idbn"] = s3
            y = y + y3
        return fn(y), new_state

    def deploy(self, params, state):
        """Collapse all branches into one {w, b} conv
        (reference switch_to_deploy, common.py:1323-1345)."""
        dense = self.children()["rbr_dense"]
        dp, _ = dense.deploy(params["rbr_dense"], state["rbr_dense"])
        w, b = dp["w"], dp["b"]
        w1, b1 = fuse_conv_bn(params["rbr_1x1"]["w"], params["rbr_1x1"]["bn"],
                              state["rbr_1x1"]["bn"])
        w = w + jnp.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        b = b + b1
        if self.has_identity:
            from yolo_series_tpu.models.reparam import _bn_as_conv
            wi, bi = _bn_as_conv(self.c1, self.g, params["idbn"], state["idbn"])
            w, b = w + wi, b + bi
        return {"w": w, "b": b}, {}


@dataclasses.dataclass(frozen=True)
class Classify(Composite):
    """Classification head: adaptive-avg-pool to 1x1 + conv + flatten
    (reference common.py:1015-1025)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1

    @property
    def cout(self):
        return self.c2

    def children(self):
        return {}

    def init(self, key):
        k1, k2 = jax.random.split(key)
        fan_in = (self.c1 // self.g) * self.k * self.k
        return {"w": conv_kernel_init(k1, self.k, self.k, self.c1 // self.g,
                                      self.c2),
                "b": conv_bias_init(k2, self.c2, fan_in)}, {}

    def apply(self, params, state, x, ctx):
        xs = x if isinstance(x, (list, tuple)) else [x]
        pooled = [jnp.mean(xi, axis=(1, 2), keepdims=True) for xi in xs]
        y = jnp.concatenate(pooled, axis=-1)
        y = conv2d(y, params["w"], self.s, autopad(self.k, self.p), self.g,
                   ctx.dtype)
        y = y + params["b"].astype(y.dtype)
        return y.reshape(y.shape[0], -1), state


@dataclasses.dataclass(frozen=True)
class FReLU(Block):
    """Funnel activation: max(x, depthwise_conv_bn(x))
    (reference utils/activations.py FReLU)."""

    c1: int
    k: int = 3

    @property
    def cout(self):
        return self.c1

    def init(self, key):
        w = conv_kernel_init(key, self.k, self.k, 1, self.c1)
        bnp, bns = bn_init(self.c1)
        return {"w": w, "bn": bnp}, {"bn": bns}

    def apply(self, params, state, x, ctx):
        y = conv2d(x, params["w"], 1, self.k // 2, self.c1, ctx.dtype)
        y, bns = batch_norm(params["bn"], state["bn"], y, ctx)
        return jnp.maximum(x, y), {"bn": bns}
