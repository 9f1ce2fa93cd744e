"""Attention blocks: ViT-lite transformer, Swin v1/v2 window attention, and
their CSP hybrids.

Parity targets: TransformerLayer/Block (reference common.py:746-789),
WindowAttention + SwinTransformerLayer/Block + STCSP{A,B,C}
(common.py:1365-1656), Swin v2 cosine-attention variants + ST2CSP{A,B,C}
(common.py:1662-2017). NHWC-native: window partitioning is pure reshape
(no NCHW permutes), softmax/bias math in fp32, matmuls on the MXU via
einsum with preferred fp32 accumulation.

The reference references an undefined DropPath (common.py:1494 — a latent
bug when drop_path > 0); here drop_path is identity at inference and the
parameter is accepted but unused (detection cfgs never set it).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models.layers import (
    Block, Composite, ConvBnAct, Ctx, _CSPA, _CSPB, _CSPC,
)


# -- primitives -------------------------------------------------------------


def _linear_init(key, cin, cout, bias=True):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    p = {"w": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def _linear(p, x):
    y = jnp.einsum("...i,io->...o", x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _ln_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, h, w):
    c = wins.shape[-1]
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 bias table
    (reference common.py:1381-1393)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask (nW, N, N) (reference create_mask,
    common.py:1499-1521)."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    wins = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# -- window attention (v1: rel-pos bias table; v2: cosine + CPB MLP) --------


@dataclasses.dataclass(frozen=True)
class WindowAttention(Block):
    dim: int
    window_size: int
    num_heads: int
    v2: bool = False

    @property
    def cout(self):
        return self.dim

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        p = {
            "qkv": _linear_init(k1, self.dim, self.dim * 3, bias=True),
            "proj": _linear_init(k2, self.dim, self.dim, bias=True),
        }
        ws = self.window_size
        if self.v2:
            # v2 keeps qkv weight bias-free and adds zero-init q/v biases
            # (k bias implicitly zero, common.py:1712-1717); our flat
            # 3*dim bias starts at zero accordingly.
            p["qkv"]["b"] = jnp.zeros((self.dim * 3,), jnp.float32)
            p["logit_scale"] = jnp.full((self.num_heads, 1, 1),
                                        math.log(10.0), jnp.float32)
            p["cpb1"] = _linear_init(k3, 2, 512, bias=True)
            p["cpb2"] = _linear_init(k4, 512, self.num_heads, bias=False)
        else:
            p["rel_bias"] = 0.02 * jax.random.normal(
                k3, ((2 * ws - 1) ** 2, self.num_heads), jnp.float32)
        return p, {}

    def _bias(self, params):
        ws = self.window_size
        idx = jnp.asarray(_rel_pos_index(ws).reshape(-1))
        if self.v2:
            # continuous position bias: log-spaced coords -> MLP (Swin v2)
            rng = np.arange(-(ws - 1), ws, dtype=np.float32)
            grid = np.stack(np.meshgrid(rng, rng, indexing="ij"), -1)
            grid = grid / max(ws - 1, 1) * 8.0
            grid = np.sign(grid) * np.log2(np.abs(grid) + 1.0) / np.log2(8)
            table = _linear(params["cpb2"], jax.nn.relu(
                _linear(params["cpb1"], jnp.asarray(grid.reshape(-1, 2)))))
            bias = 16.0 * jax.nn.sigmoid(table)
        else:
            bias = params["rel_bias"]
        n = ws * ws
        return bias[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)

    def apply(self, params, state, x, ctx, mask=None):
        """x: (B_, N, C); mask: (nW, N, N) or None."""
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        if self.v2:
            # Reference v2 keeps the k bias structurally zero and frozen
            # (common.py:1711-1728: bias-free qkv Linear + q_bias/v_bias
            # Parameters concat'd with zeros). Mask the k third here so the
            # degrees of freedom match (its gradient is exactly zero and,
            # with biases in the no-decay group, it stays at init).
            qb = params["qkv"]["b"]
            qkv_p = dict(params["qkv"])
            qkv_p["b"] = jnp.concatenate(
                [qb[:c], jnp.zeros_like(qb[c:2 * c]), qb[2 * c:]])
            qkv = _linear(qkv_p, x).reshape(b_, n, 3, nh, hd)
        else:
            qkv = _linear(params["qkv"], x).reshape(b_, n, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        if self.v2:  # cosine attention with learned temperature
            qf = qf / (jnp.linalg.norm(qf, axis=-1, keepdims=True) + 1e-6)
            kf = kf / (jnp.linalg.norm(kf, axis=-1, keepdims=True) + 1e-6)
            scale = jnp.exp(jnp.minimum(params["logit_scale"],
                                        math.log(100.0)))
            attn = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", qf * (hd ** -0.5), kf)
        attn = attn + self._bias(params)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return _linear(params["proj"], y), state


@dataclasses.dataclass(frozen=True)
class SwinTransformerLayer(Block):
    """One W-MSA/SW-MSA layer on NHWC maps (reference common.py:1472-1581;
    v2 res-post-norm variant common.py:1830-1930)."""

    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    v2: bool = False

    @property
    def cout(self):
        return self.dim

    def _attn(self):
        return WindowAttention(self.dim, self.window_size, self.num_heads,
                               v2=self.v2)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        hidden = int(self.dim * self.mlp_ratio)
        attn_p, _ = self._attn().init(k1)
        p = {
            "norm1": _ln_init(self.dim),
            "attn": attn_p,
            "norm2": _ln_init(self.dim),
            "fc1": _linear_init(k2, self.dim, hidden),
            "fc2": _linear_init(k3, hidden, self.dim),
        }
        return p, {}

    def apply(self, params, state, x, ctx):
        """x: (B, H, W, C)."""
        b, h0, w0, c = x.shape
        ws = self.window_size
        pad_b = (ws - h0 % ws) % ws
        pad_r = (ws - w0 % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        h, w = x.shape[1:3]
        # shift is unconditional when shift_size > 0: the reference's
        # min-resolution guard is commented out (common.py:1484-1487), so
        # even a single padded window gets rolled + masked.
        shift = self.shift_size

        shortcut = x
        xs = x if self.v2 else _layer_norm(params["norm1"], x)
        if shift:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        wins = _window_partition(xs, ws)
        mask = (jnp.asarray(_shift_mask(h, w, ws, shift)) if shift else None)
        att, _ = self._attn().apply(params["attn"], {}, wins, ctx, mask=mask)
        xs = _window_reverse(att, ws, h, w)
        if shift:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
        if self.v2:  # res-post-norm
            xs = _layer_norm(params["norm1"], xs)
        x = shortcut + xs

        y = x if self.v2 else _layer_norm(params["norm2"], x)
        y = _linear(params["fc2"], jax.nn.silu(_linear(params["fc1"], y)))
        if self.v2:
            y = _layer_norm(params["norm2"], y)
        x = x + y

        if pad_b or pad_r:
            x = x[:, :h0, :w0]
        return x, state


@dataclasses.dataclass(frozen=True)
class SwinTransformerBlock(Composite):
    """Optional channel conv + n alternating W/SW layers
    (reference common.py:1584-1599; v2 common.py:1933-1948)."""

    c1: int
    c2: int
    num_heads: int
    num_layers: int
    window_size: int = 8
    v2: bool = False

    @property
    def cout(self):
        return self.c2

    def children(self):
        kids = {}
        if self.c1 != self.c2:
            kids["conv"] = ConvBnAct(self.c1, self.c2, 1, 1)
        for i in range(self.num_layers):
            kids[f"m{i}"] = SwinTransformerLayer(
                self.c2, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                v2=self.v2)
        return kids

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        if self.c1 != self.c2:
            x = call("conv", x)
        for i in range(self.num_layers):
            x = call(f"m{i}", x)
        return x, ns


def _stcsp(base, v2):
    class _ST(base):
        def inner(self, c_):
            # v1 SwinTransformerBlock defaults window_size=8, v2
            # SwinTransformer2Block defaults 7 (common.py:1585, :1947);
            # heads = c_//32 (guarded >=1 where the reference would crash)
            return [SwinTransformerBlock(c_, c_, max(c_ // 32, 1), self.n,
                                         window_size=7 if v2 else 8, v2=v2)]

        def children(self):
            kids = super().children()
            # single SwinTransformerBlock carries all n layers
            kids = {k: v for k, v in kids.items() if not (k.startswith("m") and k != "m0")}
            return kids

        def apply(self, params, state, x, ctx):
            # same topology but the inner chain is one block
            call, ns = self._run(params, state, ctx)
            if isinstance(self, _CSPB):
                x1 = call("cv1", x)
                y1 = call("m0", x1)
                y2 = call("cv2", x1)
                return call("cv3", jnp.concatenate([y1, y2], -1)), ns
            y1 = call("m0", call("cv1", x))
            if isinstance(self, _CSPC):
                y1 = call("cv3", y1)
                y2 = call("cv2", x)
                return call("cv4", jnp.concatenate([y1, y2], -1)), ns
            y2 = call("cv2", x)
            return call("cv3", jnp.concatenate([y1, y2], -1)), ns

    _ST.__name__ = f"{'ST2' if v2 else 'ST'}{base.__name__[-4:]}"
    return _ST


STCSPA = _stcsp(_CSPA, v2=False)
STCSPB = _stcsp(_CSPB, v2=False)
STCSPC = _stcsp(_CSPC, v2=False)
ST2CSPA = _stcsp(_CSPA, v2=True)
ST2CSPB = _stcsp(_CSPB, v2=True)
ST2CSPC = _stcsp(_CSPC, v2=True)


# -- ViT-lite ----------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TransformerBlock(Composite):
    """Learned-pos-embed transformer over flattened maps (reference
    common.py:746-789; LayerNorm-free, matching the reference)."""

    c1: int
    c2: int
    num_heads: int
    num_layers: int

    @property
    def cout(self):
        return self.c2

    def children(self):
        kids = {}
        if self.c1 != self.c2:
            kids["conv"] = ConvBnAct(self.c1, self.c2, 1, 1)
        return kids

    def init(self, key):
        params, state = Composite.init(self, key)
        keys = jax.random.split(jax.random.fold_in(key, 1), self.num_layers * 7 + 1)
        c = self.c2
        params["pos"] = _linear_init(keys[0], c, c)
        for i in range(self.num_layers):
            base = keys[1 + i * 7:1 + (i + 1) * 7]
            # nn.MultiheadAttention: xavier-uniform in_proj, zero biases
            xav = math.sqrt(6.0 / (4 * c))
            params[f"tr{i}"] = {
                "q": _linear_init(base[0], c, c, bias=False),
                "k": _linear_init(base[1], c, c, bias=False),
                "v": _linear_init(base[2], c, c, bias=False),
                # the reference layer ALSO runs nn.MultiheadAttention, whose
                # packed in_proj (3c,c)+bias and out_proj apply on top of
                # q/k/v above (common.py:752-758)
                "in_proj": {"w": jax.random.uniform(
                    base[5], (c, 3 * c), jnp.float32, -xav, xav),
                    "b": jnp.zeros((3 * c,), jnp.float32)},
                "out_proj": {"w": _linear_init(base[6], c, c)["w"],
                             "b": jnp.zeros((c,), jnp.float32)},
                "fc1": _linear_init(base[3], c, c, bias=False),
                "fc2": _linear_init(base[4], c, c, bias=False),
            }
        return params, state

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        if self.c1 != self.c2:
            x = call("conv", x)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + _linear(params["pos"], p)
        nh = self.num_heads
        hd = c // nh

        def heads(t):
            return t.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

        for i in range(self.num_layers):
            tp = params[f"tr{i}"]
            qi = _linear(tp["q"], p)
            ki = _linear(tp["k"], p)
            vi = _linear(tp["v"], p)
            wq, wk, wv = jnp.split(tp["in_proj"]["w"], 3, axis=1)
            bq, bk, bv = jnp.split(tp["in_proj"]["b"], 3)
            q = heads(_linear({"w": wq, "b": bq}, qi))
            k = heads(_linear({"w": wk, "b": bk}, ki))
            v = heads(_linear({"w": wv, "b": bv}, vi))
            attn = jax.nn.softmax(
                jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                           k.astype(jnp.float32)) / math.sqrt(hd), -1)
            y = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(x.dtype), v)
            y = y.transpose(0, 2, 1, 3).reshape(b, -1, c)
            y = _linear(tp["out_proj"], y)
            p = y + p
            p = _linear(tp["fc2"], _linear(tp["fc1"], p)) + p
        return p.reshape(b, h, w, c), ns
