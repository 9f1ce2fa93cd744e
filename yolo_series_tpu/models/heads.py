"""Detection heads: Detect / IDetect / IAuxDetect (+ keypoint/bin variants).

Semantics mirror reference models/yolo.py (Detect yolo.py:23-94, IDetect
yolo.py:97-207, IAuxDetect yolo.py:311-430) with a TPU-first decode: grids
are trace-time constants (broadcasted iota — no cached host tensors or
shape-change re-syncs), decode math is fused elementwise in fp32, and the
per-level outputs concatenate into one (B, sum(na*ny*nx), no) tensor in the
reference's anchor-major flatten order so downstream NMS and parity tests
line up element-for-element.

Training output layout is (B, na, ny, nx, no) per level — identical index
semantics to the reference's .view(bs,na,no,ny,nx).permute(0,1,3,4,2)
(yolo.py:49) so the loss/assignment code can be golden-tested 1:1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models.layers import (
    Block, Ctx, ImplicitA, ImplicitM, PlainConv, _init_children,
)


def _decode_level(p, stride, anchors_px, nc):
    """p: (B, ny, nx, na, no) raw logits -> (B, na*ny*nx, no) decoded.

    Decode math == reference yolo.py:55-57:
      xy = (sigmoid*2 - 0.5 + grid) * stride ; wh = (sigmoid*2)^2 * anchor_px
    """
    b, ny, nx, na, no = p.shape
    y = jax.nn.sigmoid(p.astype(jnp.float32))
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]           # (ny, nx, 1, 2)
    anc = jnp.asarray(anchors_px, jnp.float32)[None, None, :, :]  # (1, 1, na, 2)
    xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = jnp.square(y[..., 2:4] * 2.0) * anc
    out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
    # anchor-major flatten (reference yolo.py:63 z.append(y.view(bs,-1,no)))
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, na * ny * nx, no)
    return out


@dataclasses.dataclass(frozen=True)
class Detect:
    """Anchor-based decode head (reference yolo.py:23-94).

    apply(...) returns a dict:
      training:  {"raw": [per-level (B, na, ny, nx, no)]}
      inference: {"pred": (B, A, no), "raw": [...]}
    """

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]   # normalized by stride, (nl, na*2)
    ch: Tuple[int, ...]
    strides: Tuple[float, ...]

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def no(self):
        return self.nc + 5

    def anchors_grid(self):
        """(nl, na, 2) anchors in pixels (anchor * stride)."""
        a = np.asarray(self.anchors, np.float32).reshape(self.nl, self.na, 2)
        return a * np.asarray(self.strides, np.float32)[:, None, None]

    def _convs(self):
        return [PlainConv(c, self.no * self.na, 1) for c in self.ch]

    def init(self, key):
        keys = jax.random.split(key, self.nl)
        params = {"m": [cv.init(k)[0] for cv, k in zip(self._convs(), keys)]}
        return params, {}

    def _raw_level(self, params, xs, i, ctx):
        cv = self._convs()[i]
        y, _ = cv.apply(params["m"][i], {}, xs[i], ctx)
        b, ny, nx, _ = y.shape
        y = y.reshape(b, ny, nx, self.na, self.no)
        return y

    def apply(self, params, state, xs: Sequence[jnp.ndarray], ctx: Ctx):
        raws, preds = [], []
        apx = self.anchors_grid()
        for i in range(self.nl):
            y = self._raw_level(params, xs, i, ctx)
            raws.append(y.transpose(0, 3, 1, 2, 4))  # (B, na, ny, nx, no)
            if not ctx.training:
                preds.append(_decode_level(y, self.strides[i], apx[i], self.nc))
        if ctx.training:
            return {"raw": raws}, state
        return {"pred": jnp.concatenate(preds, axis=1), "raw": raws}, state

    def _bias_prior(self, stride, cf=None):
        """Additive obj/cls bias prior (reference yolo.py:633-644):
        b_obj += log(8 / (640/stride)^2); b_cls += log(0.6 / (nc - 0.99))."""
        prior = np.zeros((self.na, self.no), np.float32)
        prior[:, 4] = math.log(8.0 / (640.0 / stride) ** 2)
        if cf is None:
            prior[:, 5:] = math.log(0.6 / (self.nc - 0.99))
        else:
            prior[:, 5:] = np.log(cf / cf.sum())
        return jnp.asarray(prior.reshape(-1))

    def init_biases(self, params, cf=None):
        new_m = [{**mp, "b": mp["b"] + self._bias_prior(self.strides[i], cf)}
                 for i, mp in enumerate(params["m"])]
        return {**params, "m": new_m}


@dataclasses.dataclass(frozen=True)
class IDetect(Detect):
    """Detect + YOLOR implicit knowledge (reference yolo.py:97-207).

    ia (additive, before conv) and im (multiplicative, after conv); fusing
    them into the conv weights (models/reparam.py) turns the params into a
    plain Detect param tree, after which apply takes the Detect path
    (== reference fuseforward, yolo.py:140).
    """

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        params, state = Detect.init(self, k1)
        kia = jax.random.split(k2, self.nl)
        kim = jax.random.split(k3, self.nl)
        params["ia"] = [ImplicitA(c).init(k)[0] for c, k in zip(self.ch, kia)]
        params["im"] = [ImplicitM(self.no * self.na).init(k)[0] for k in kim]
        return params, state

    def _raw_level(self, params, xs, i, ctx):
        x = xs[i]
        if "ia" in params:
            x = x + params["ia"][i]["v"].astype(x.dtype)
        cv = self._convs()[i]
        y, _ = cv.apply(params["m"][i], {}, x, ctx)
        if "im" in params:
            y = y * params["im"][i]["v"].astype(y.dtype)
        b, ny, nx, _ = y.shape
        return y.reshape(b, ny, nx, self.na, self.no)


@dataclasses.dataclass(frozen=True)
class IAuxDetect(Detect):
    """P6 training head with auxiliary coarse branch (reference yolo.py:311-430).

    ch has 2*nl entries: lead convs on ch[:nl], aux convs on ch[nl:].
    Training returns raw = lead maps + aux maps (2*nl entries); inference
    decodes lead only (yolo.py:334-362).
    """

    def _convs(self):
        return [PlainConv(c, self.no * self.na, 1) for c in self.ch[: self.nl]]

    def _aux_convs(self):
        return [PlainConv(c, self.no * self.na, 1) for c in self.ch[self.nl:]]

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        keys = jax.random.split(k1, self.nl)
        params = {"m": [cv.init(k)[0] for cv, k in zip(self._convs(), keys)]}
        keys2 = jax.random.split(k2, self.nl)
        params["m2"] = [cv.init(k)[0] for cv, k in zip(self._aux_convs(), keys2)]
        kia = jax.random.split(k3, self.nl)
        kim = jax.random.split(k4, self.nl)
        params["ia"] = [ImplicitA(c).init(k)[0] for c, k in zip(self.ch[: self.nl], kia)]
        params["im"] = [ImplicitM(self.no * self.na).init(k)[0] for k in kim]
        return params, {}

    def _raw_level(self, params, xs, i, ctx):
        x = xs[i]
        if "ia" in params:
            x = x + params["ia"][i]["v"].astype(x.dtype)
        y, _ = self._convs()[i].apply(params["m"][i], {}, x, ctx)
        if "im" in params:
            y = y * params["im"][i]["v"].astype(y.dtype)
        b, ny, nx, _ = y.shape
        return y.reshape(b, ny, nx, self.na, self.no)

    def _raw_aux_level(self, params, xs, i, ctx):
        y, _ = self._aux_convs()[i].apply(params["m2"][i], {}, xs[self.nl + i], ctx)
        b, ny, nx, _ = y.shape
        return y.reshape(b, ny, nx, self.na, self.no)

    def apply(self, params, state, xs, ctx):
        raws, preds = [], []
        apx = self.anchors_grid()
        for i in range(self.nl):
            y = self._raw_level(params, xs, i, ctx)
            raws.append(y.transpose(0, 3, 1, 2, 4))
            if not ctx.training:
                preds.append(_decode_level(y, self.strides[i], apx[i], self.nc))
        if ctx.training:
            for i in range(self.nl):
                y2 = self._raw_aux_level(params, xs, i, ctx)
                raws.append(y2.transpose(0, 3, 1, 2, 4))
            return {"raw": raws}, state
        return {"pred": jnp.concatenate(preds, axis=1), "raw": raws}, state

    def init_biases(self, params, cf=None):
        params = Detect.init_biases(self, params, cf)
        new_m2 = [{**mp, "b": mp["b"] + self._bias_prior(self.strides[i], cf)}
                  for i, mp in enumerate(params["m2"])]
        return {**params, "m2": new_m2}


HEAD_TYPES = (Detect, IDetect, IAuxDetect)


@dataclasses.dataclass(frozen=True)
class IBin(Detect):
    """Binned w/h regression head (reference yolo.py:433-505): per-anchor
    output = [x, y, w_bin(22), h_bin(22), obj, cls...]; w/h decode via
    SigmoidBin argmax-bin + residual over [0, 4] x anchor."""

    bin_count: int = 21

    @property
    def no(self):
        return self.nc + 3 + 2 * (self.bin_count + 1)

    def _bins(self):
        from yolo_series_tpu.losses.bin import SigmoidBin
        return SigmoidBin(self.bin_count, 0.0, 4.0)

    def init(self, key):
        return IDetect.init(self, key)

    def _raw_level(self, params, xs, i, ctx):
        return IDetect._raw_level(self, params, xs, i, ctx)

    def apply(self, params, state, xs, ctx):
        raws, preds = [], []
        apx = self.anchors_grid()
        sb = self._bins()
        bl = self.bin_count + 1
        for i in range(self.nl):
            yraw = self._raw_level(params, xs, i, ctx)   # (B, ny, nx, na, no)
            raws.append(yraw.transpose(0, 3, 1, 2, 4))
            if not ctx.training:
                b, ny, nx, na, _ = yraw.shape
                y = jax.nn.sigmoid(yraw.astype(jnp.float32))
                gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
                gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
                grid = jnp.stack([gx, gy], -1)[:, :, None, :]
                xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * self.strides[i]
                anc = jnp.asarray(apx[i], jnp.float32)[None, None, :, :]
                pw = sb.forward(y[..., 2:2 + bl]) * anc[..., 0]
                ph = sb.forward(y[..., 2 + bl:2 + 2 * bl]) * anc[..., 1]
                rest = y[..., 2 + 2 * bl:]               # obj + cls
                out = jnp.concatenate([xy, pw[..., None], ph[..., None], rest], -1)
                preds.append(out.transpose(0, 3, 1, 2, 4).reshape(
                    b, na * ny * nx, -1))
        if ctx.training:
            return {"raw": raws}, state
        return {"pred": jnp.concatenate(preds, 1), "raw": raws}, state

    def _bias_prior(self, stride, cf=None):
        """obj/cls prior at the IBin channel layout
        (reference _initialize_biases_bin, yolo.py:657-670)."""
        prior = np.zeros((self.na, self.no), np.float32)
        obj_idx = 2 * (self.bin_count + 1) + 2
        prior[:, obj_idx] = math.log(8.0 / (640.0 / stride) ** 2)
        prior[:, obj_idx + 1:] = (math.log(0.6 / (self.nc - 0.99)) if cf is None
                                  else np.log(cf / cf.sum()))
        return jnp.asarray(prior.reshape(-1))


@dataclasses.dataclass(frozen=True)
class IKeypoint(Detect):
    """Pose head: nc+5 detection channels + 3*nkpt keypoint channels
    (reference yolo.py:210-308). Keypoints decode as
    (sig*2 - 0.5 + grid) * stride with sigmoid visibility."""

    nkpt: int = 17

    @property
    def no_det(self):
        return self.nc + 5

    @property
    def no_kpt(self):
        return 3 * self.nkpt

    @property
    def no(self):
        return self.no_det + self.no_kpt

    def _convs(self):
        return [PlainConv(c, self.no_det * self.na, 1) for c in self.ch]

    def _kpt_convs(self):
        return [PlainConv(c, self.no_kpt * self.na, 1) for c in self.ch]

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        keys = jax.random.split(k1, self.nl)
        params = {"m": [cv.init(k)[0] for cv, k in zip(self._convs(), keys)]}
        keys2 = jax.random.split(k2, self.nl)
        params["m_kpt"] = [cv.init(k)[0] for cv, k in zip(self._kpt_convs(), keys2)]
        kia = jax.random.split(k3, self.nl)
        kim = jax.random.split(k4, self.nl)
        params["ia"] = [ImplicitA(c).init(k)[0] for c, k in zip(self.ch, kia)]
        params["im"] = [ImplicitM(self.no_det * self.na).init(k)[0] for k in kim]
        return params, {}

    def apply(self, params, state, xs, ctx):
        raws, preds = [], []
        apx = self.anchors_grid()
        for i in range(self.nl):
            x = xs[i]
            xd = x + params["ia"][i]["v"].astype(x.dtype) if "ia" in params else x
            det, _ = self._convs()[i].apply(params["m"][i], {}, xd, ctx)
            if "im" in params:
                det = det * params["im"][i]["v"].astype(det.dtype)
            kpt, _ = self._kpt_convs()[i].apply(params["m_kpt"][i], {}, x, ctx)
            b, ny, nx, _ = det.shape
            # CHANNEL-true reference layout (yolo.py:257-260): the det and
            # kpt conv outputs are concatenated along channels and the
            # combined axis is reinterpreted as (na, no) — which threads
            # det channels of anchors 1+ into anchor 0's keypoint slots.
            # The trained network learns this interpretation, so exact
            # weight-level parity requires reproducing it, quirk and all.
            full = jnp.concatenate([det, kpt], -1).reshape(
                b, ny, nx, self.na, self.no)
            raws.append(full.transpose(0, 3, 1, 2, 4))
            if not ctx.training:
                x_det = full[..., :self.no_det].astype(jnp.float32)
                x_kpt = full[..., self.no_det:].astype(jnp.float32)
                y = jax.nn.sigmoid(x_det)
                gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
                gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
                grid = jnp.stack([gx, gy], -1)[:, :, None, :]
                anc = jnp.asarray(apx[i], jnp.float32)[None, None, :, :]
                xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * self.strides[i]
                wh = jnp.square(y[..., 2:4] * 2.0) * anc
                # kpt x/y decode from RAW logits (no sigmoid, yolo.py:278-280)
                kx = (x_kpt[..., 0::3] * 2.0 - 0.5 + grid[..., 0:1]) * self.strides[i]
                ky = (x_kpt[..., 1::3] * 2.0 - 0.5 + grid[..., 1:2]) * self.strides[i]
                kv = jax.nn.sigmoid(x_kpt[..., 2::3])
                kout = jnp.stack([kx, ky, kv], -1).reshape(*x_kpt.shape[:-1], -1)
                out = jnp.concatenate([xy, wh, y[..., 4:], kout], -1)
                preds.append(out.transpose(0, 3, 1, 2, 4).reshape(
                    b, self.na * ny * nx, -1))
        if ctx.training:
            return {"raw": raws}, state
        return {"pred": jnp.concatenate(preds, 1), "raw": raws}, state


HEAD_TYPES = (Detect, IDetect, IAuxDetect, IBin, IKeypoint)


def _ikeypoint_bias_prior(self, stride, cf=None):
    prior = np.zeros((self.na, self.no_det), np.float32)
    prior[:, 4] = math.log(8.0 / (640.0 / stride) ** 2)
    prior[:, 5:] = (math.log(0.6 / (self.nc - 0.99)) if cf is None
                    else np.log(cf / cf.sum()))
    return jnp.asarray(prior.reshape(-1))


IKeypoint._bias_prior = _ikeypoint_bias_prior
