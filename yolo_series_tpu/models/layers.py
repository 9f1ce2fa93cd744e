"""Functional block zoo (NHWC, pure init/apply, pytree params).

TPU-first re-design of the reference block zoo in models/common.py:
every block is a frozen dataclass holding *static* config; `init(key)`
returns a params pytree (+ a state pytree for BatchNorm running stats) and
`apply(params, state, x, ctx)` is a pure function traced once under jit.
Convs run NHWC x HWIO (XLA's native TPU layout); BatchNorm is
cross-replica-synced with `lax.pmean` when a mesh axis is given (the
first-class equivalent of the reference's opt-in SyncBatchNorm,
train.py:240-242).

Block semantics mirror models/common.py (cited per class) so that torch
checkpoints import 1:1; the *implementation* is jnp/lax throughout.
"""

from __future__ import annotations

import dataclasses
import functools as _functools
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]
State = Dict[str, Any]

BN_EPS = 1e-3       # reference torch_utils.initialize_weights: eps=1e-3
BN_MOMENTUM = 0.03  # reference torch_utils.initialize_weights: momentum=0.03


@dataclasses.dataclass(frozen=True)
class Ctx:
    """Static per-trace context."""

    training: bool = False
    axis_name: Optional[str] = None  # mesh axis for cross-replica BN sync
    dtype: Any = jnp.float32         # compute dtype for convs (bf16 on TPU)
    observer: Any = None             # eager-only hook: observer(path, x) at
    path: str = ""                   # every conv input (int8 calibration)
    bn_shards: int = 1               # >1: PER-REPLICA BatchNorm — the batch
    # splits into this many contiguous groups (one per data shard), each
    # normalized with its OWN local moments: the reference's default
    # UNsynced per-GPU BN (--sync-bn is opt-in there, train.py:240-242).
    # Running stats follow group 0, matching torch DDP's
    # broadcast_buffers=True rank-0 buffer semantics.


# ---------------------------------------------------------------------------
# activations


def _leaky(slope):
    def f(x):
        return jax.nn.leaky_relu(x, negative_slope=slope)
    return f


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "hardswish": jax.nn.hard_swish,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


def get_activation(spec) -> Tuple[str, Any]:
    """Resolve an activation spec to (canonical_name, fn).

    Accepts my canonical strings ('silu', 'leaky_relu:0.1'), booleans
    (True -> silu, False/None -> identity, mirroring reference Conv's
    `act=True` default, common.py:105), and the reference YAML's torch
    module strings ('nn.LeakyReLU(0.1)', 'nn.SiLU()') for cfg compat.
    """
    if spec is True:
        return "silu", ACTIVATIONS["silu"]
    if spec is False or spec is None:
        return "identity", ACTIVATIONS["identity"]
    s = str(spec).strip()
    if s.startswith("nn."):  # reference-format module string
        low = s[3:].split("(")[0].lower()
        mapping = {"silu": "silu", "relu": "relu", "relu6": "relu6",
                   "hardswish": "hardswish", "mish": "mish", "identity": "identity"}
        if low in mapping:
            return mapping[low], ACTIVATIONS[mapping[low]]
        if low == "leakyrelu":
            inner = s[s.index("(") + 1:s.rindex(")")]
            slope = float(inner) if inner else 0.01
            return f"leaky_relu:{slope}", _leaky(slope)
        raise ValueError(f"unsupported activation spec {spec!r}")
    if s.startswith("leaky_relu"):
        slope = float(s.split(":")[1]) if ":" in s else 0.01
        return f"leaky_relu:{slope}", _leaky(slope)
    if s in ACTIVATIONS:
        return s, ACTIVATIONS[s]
    raise ValueError(f"unsupported activation spec {spec!r}")


def autopad(k, p=None):
    """'same' padding for odd kernels (reference common.py:23).
    k may be an int or an (kh, kw) tuple."""
    if p is not None:
        return p
    if isinstance(k, (tuple, list)):
        return tuple(x // 2 for x in k)
    return k // 2


def _pair(k):
    return (k, k) if isinstance(k, int) else tuple(k)


# ---------------------------------------------------------------------------
# primitive param initializers (match torch Conv2d/BatchNorm2d defaults so a
# fresh model here and a fresh reference model share the same init law)


def conv_kernel_init(key, kh, kw, cin_per_group, cout):
    """torch kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)); HWIO layout."""
    fan_in = cin_per_group * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(
        key, (kh, kw, cin_per_group, cout), jnp.float32, -bound, bound)


def conv_bias_init(key, cout, fan_in):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (cout,), jnp.float32, -bound, bound)


def bn_init(c):
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


def _bn_train_moments(x, m0, axis_name):
    """Training batch moments (fp32), shifted one-pass for wide layers.

    Shifted one-pass: center on the RUNNING mean (a known constant), so
    sum(xc) and sum(xc^2) compute in a single fused HBM read of x. Plain
    E[x^2]-mu^2 is ill-conditioned (cancellation amplifies
    partitioned-reduction rounding into sharded-vs-unsharded divergence);
    with the shift, E[xc] ~ 0 and the correction term E[xc]^2 is tiny,
    matching two-pass accuracy. Two-pass (profiled, bs16@640 yolov7) cost
    ~35 ms/step re-reading hi-res activations for the variance pass.
    When m0 is stale (all-zeros at init; right after a sharp distribution
    shift) this degrades to the classic one-pass form: relative var error
    ~ eps*(1 + mc^2/var) in fp32, < 1e-3 even at |mc|/std = 100 — below
    the bf16 activation noise floor — and the max(.,0) clamp guards the
    pathological limit. Kaiming-init conv outputs are near zero-mean, so
    the init case is also benign.
    """
    xf = x.astype(jnp.float32)
    if x.shape[-1] >= 64:
        xc = xf - m0
        mc = jnp.mean(xc, axis=(0, 1, 2))
        msq = jnp.mean(jnp.square(xc), axis=(0, 1, 2))
        if axis_name is not None:
            mc = jax.lax.pmean(mc, axis_name)
            msq = jax.lax.pmean(msq, axis_name)
        mean = m0 + mc
        var = jnp.maximum(msq - jnp.square(mc), 0.0)
    else:
        # narrow layers (< half a 128-lane tile, i.e. the hi-res stem
        # conv): the fused two-output reduce forces a LAYOUT copy of the
        # huge activation (~3.5 ms each way at 640x640x32, profiled),
        # which costs more than the second read — keep two-pass there
        mean = jnp.mean(xf, axis=(0, 1, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
        if axis_name is not None:
            var = jax.lax.pmean(var, axis_name)
    return mean, var


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bn_train_core(axis_name, x, scale, bias, m0):
    """Training-mode BN (moments + normalize + affine) with a custom VJP.

    WHY custom: under plain autodiff the elementwise chain
    `(x.f32 - mean) * inv + bias` saves its fp32 intermediates for the
    backward pass. On TPU a bf16->fp32 convert is a data-FORMAT change
    (retile (8,128)(2,1) -> (8,128)), so every BN residual materializes a
    full-size fp32 copy of a hi-res activation. Profiled on yolov7-w6
    bs4@1280 train: ~70 ms/step of 233 is convert/copy/pad traffic rooted
    at these saves. The custom VJP saves only (bf16 x, mean, var, scale)
    and recomputes xhat inside fused backward reductions — the classic
    in-place BN backward (two fused reads of x/gy, one write of dx, all
    in bf16 layouts).

    Backward is the exact analytic gradient of these moments: for both
    the shifted one-pass and the two-pass form, d mean/dx_i = 1/n and
    d var/dx_i = 2 (x_i - mean)/n, so the classic BN training backward
    applies unchanged. Cross-replica (pmean) moments psum the channel
    sums with the global n.
    """
    mean, var = _bn_train_moments(x, m0, axis_name)
    inv = jax.lax.rsqrt(var + BN_EPS) * scale
    y = (x.astype(jnp.float32) - mean) * inv + bias
    return y.astype(x.dtype), mean, var


def _bn_train_core_fwd(axis_name, x, scale, bias, m0):
    y, mean, var = _bn_train_core(axis_name, x, scale, bias, m0)
    return (y, mean, var), (x, mean, var, scale)


def _bn_train_core_bwd(axis_name, res, cots):
    x, mean, var, scale = res
    gy, gm, gv = cots
    xf = x.astype(jnp.float32)
    gyf = gy.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + BN_EPS)
    xc = xf - mean
    xhat = xc * inv
    sg = jnp.sum(gyf, axis=(0, 1, 2))
    sgx = jnp.sum(gyf * xhat, axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    if axis_name is not None:
        sg = jax.lax.psum(sg, axis_name)
        sgx = jax.lax.psum(sgx, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    dscale = sgx
    dbias = sg
    dx = (scale * inv) * (gyf - sg / n - xhat * (sgx / n))
    # cotangents of the aux (mean, var) outputs — zero in the train step
    # (they only feed the running-stat update) but kept exact:
    dx = dx + gm / n + gv * (2.0 / n) * xc
    return dx.astype(x.dtype), dscale, dbias, jnp.zeros_like(mean)


_bn_train_core.defvjp(_bn_train_core_fwd, _bn_train_core_bwd)


def batch_norm(bn_params, bn_state, x, ctx: Ctx):
    """BatchNorm with optional cross-replica moment sync (pmean SyncBN)."""
    scale, bias = bn_params["scale"], bn_params["bias"]
    if ctx.training and ctx.bn_shards > 1:
        return _batch_norm_per_replica(bn_params, bn_state, x, ctx)
    if ctx.training:
        m0 = jax.lax.stop_gradient(bn_state["mean"])
        y, mean, var = _bn_train_core(ctx.axis_name, x, scale, bias, m0)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if ctx.axis_name is not None:
            n = n * jax.lax.psum(1, ctx.axis_name)
        unbiased = var * (n / max(n - 1, 1))
        m = BN_MOMENTUM
        new_state = {
            "mean": (1 - m) * bn_state["mean"] + m * mean,
            "var": (1 - m) * bn_state["var"] + m * unbiased,
        }
        return y, new_state
    mean, var = bn_state["mean"], bn_state["var"]
    inv = jax.lax.rsqrt(var + BN_EPS) * scale
    y = (x.astype(jnp.float32) - mean) * inv + bias
    return y.astype(x.dtype), bn_state


def _batch_norm_per_replica(bn_params, bn_state, x, ctx: Ctx):
    """Per-replica (unsynced) BatchNorm — the reference's DEFAULT multi-GPU
    behavior (SyncBN is opt-in, train.py:240-242): each data shard
    normalizes its local sub-batch with its own moments.

    Expressed in the pjit global view as a static group reshape: the batch
    splits into `ctx.bn_shards` contiguous groups aligned with the 'data'
    sharding (batch axis 0 sharded over n shards -> group g IS shard g's
    local sub-batch), so the per-group moments stay shard-local and XLA
    inserts no collective. Running stats track group 0 (torch DDP
    broadcast_buffers=True makes every rank adopt rank 0's buffers each
    forward; torch_utils.py:318-340 reverts SyncBN the same way)."""
    g = ctx.bn_shards
    b = x.shape[0]
    assert b % g == 0, (b, g)
    scale, bias = bn_params["scale"], bn_params["bias"]
    xf = x.astype(jnp.float32).reshape(g, b // g, *x.shape[1:])
    mean = jnp.mean(xf, axis=(1, 2, 3))                      # (g, C)
    var = jnp.mean(jnp.square(xf - mean[:, None, None, None, :]), axis=(1, 2, 3))
    n = (b // g) * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    m = BN_MOMENTUM
    new_state = {
        "mean": (1 - m) * bn_state["mean"] + m * mean[0],
        "var": (1 - m) * bn_state["var"] + m * unbiased[0],
    }
    inv = jax.lax.rsqrt(var + BN_EPS) * scale               # (g, C)
    y = (xf - mean[:, None, None, None, :]) * inv[:, None, None, None, :] \
        + bias
    return y.reshape(x.shape).astype(x.dtype), new_state


def conv2d(x, w, stride=1, padding=0, groups=1, dtype=None):
    """NHWC x HWIO convolution. padding: int (symmetric) or 'SAME'/'VALID'."""
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    elif isinstance(padding, (tuple, list)) and padding and isinstance(padding[0], int):
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        pad = padding
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=_pair(stride), padding=pad,
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_tiled(x, k):
    """Non-overlapping k x k / stride-k max pool via reshape.

    XLA lowers the generic reduce_window gradient to select_and_scatter,
    a serial scatter that profiled at 11.3 ms/step on TPU v5e (bs16@640
    yolov7). For the non-overlapping case each input belongs to exactly
    one window, so the backward is a pure elementwise mask (ties split
    equally — a valid subgradient; float conv activations tie with
    probability ~0)."""
    N, H, W, C = x.shape
    xr = x.reshape(N, H // k, k, W // k, k, C)
    return xr.max(axis=(2, 4))


def _max_pool_tiled_fwd(x, k):
    N, H, W, C = x.shape
    xr = x.reshape(N, H // k, k, W // k, k, C)
    m = xr.max(axis=(2, 4))
    return m, (xr, m)


def _max_pool_tiled_bwd(k, res, g):
    xr, m = res
    mask = (xr == m[:, :, None, :, None, :])
    cnt = mask.sum(axis=(2, 4), keepdims=True)
    gr = jnp.where(mask, (g / cnt.squeeze((2, 4)))[:, :, None, :, None, :],
                   jnp.zeros((), xr.dtype))
    N, Ho, _, Wo, _, C = xr.shape
    return (gr.reshape(N, Ho * k, Wo * k, C),)


_max_pool_tiled.defvjp(_max_pool_tiled_fwd, _max_pool_tiled_bwd)


def max_pool(x, k, s, padding):
    """Max pool NHWC; padding int -> symmetric -inf pad (torch semantics)."""
    if (s == k and padding == 0 and x.ndim == 4
            and x.shape[1] % k == 0 and x.shape[2] % k == 0
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return _max_pool_tiled(x, k)
    if isinstance(padding, int):
        pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    else:
        pad = padding
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, k, k, 1), (1, s, s, 1), pad)


def max_pool_pyramid(x, ks: Sequence[int]):
    """Stride-1 SAME max pools for increasing odd kernels, CHAINED where
    possible: pooling a k1-pooled map with kernel kc gives the
    (k1 + kc - 1) pool exactly (max is associative over window unions), so
    (5, 9, 13) costs three 5x5 pools instead of 25+81+169 windows — and the
    composed gradient routes to the same (a.s. unique) argmax, so training
    matches the parallel form. Matches reference SPP/SPPCSPC semantics
    (common.py:201, :274)."""
    outs = []
    prev, prev_k = x, 1
    for k in ks:
        kc = k - prev_k + 1
        if kc < 1 or kc % 2 == 0:  # non-chainable sequence: pool from x
            prev, prev_k = max_pool(x, k, 1, k // 2), k
        else:
            prev, prev_k = max_pool(prev, kc, 1, kc // 2), k
        outs.append(prev)
    return outs


# ---------------------------------------------------------------------------
# block protocol


class Block:
    """Base: subclasses are frozen dataclasses with static config.

    init(key) -> (params, state); apply(params, state, x, ctx) -> (y, state').
    `cout` and `stride_factor` drive the graph compiler's channel/stride
    propagation (replacing the reference's dummy 256px forward,
    models/yolo.py:536).
    """

    cout: int
    stride_factor: float = 1.0

    def init(self, key):
        raise NotImplementedError

    def apply(self, params, state, x, ctx: Ctx):
        raise NotImplementedError


def _init_children(key, children: Dict[str, Block]):
    keys = jax.random.split(key, max(len(children), 1))
    params, state = {}, {}
    for (name, child), k in zip(children.items(), keys):
        p, s = child.init(k)
        params[name] = p
        state[name] = s
    return params, state


def _apply_child(child: Block, params, state, name, x, ctx):
    y, s = child.apply(params[name], state[name], x, ctx)
    return y, s


class Composite(Block):
    """Block made of named children; subclass provides `children()` + `flow`."""

    def children(self) -> Dict[str, Block]:
        raise NotImplementedError

    def init(self, key):
        return _init_children(key, self.children())

    def _run(self, params, state, ctx):
        """Returns (call, finalize): call(name, x) applies child by name."""
        kids = self.children()
        new_state = dict(state)

        def call(name, x):
            c = (dataclasses.replace(ctx, path=f"{ctx.path}/{name}")
                 if ctx.observer is not None else ctx)
            y, s = kids[name].apply(params[name], state[name], x, c)
            new_state[name] = s
            return y

        return call, new_state


# ---------------------------------------------------------------------------
# atomic blocks


@dataclasses.dataclass(frozen=True)
class ConvBnAct(Block):
    """Conv + BN + act (reference Conv, common.py:99-111).

    After re-parameterization the params dict carries a fused bias `b`
    instead of `bn`, and apply takes the fused path (== reference
    fuseforward, common.py:110).
    """

    c1: int
    c2: int
    k: Any = 1
    s: Any = 1  # int or (sh, sw), e.g. CrossConv's (1,s)/(s,1) factorization
    p: Optional[int] = None
    g: int = 1
    act: Any = True

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s if isinstance(self.s, int) else max(self.s))

    def init(self, key):
        kh, kw = _pair(self.k)
        w = conv_kernel_init(key, kh, kw, self.c1 // self.g, self.c2)
        bnp, bns = bn_init(self.c2)
        return {"w": w, "bn": bnp}, {"bn": bns}

    def apply(self, params, state, x, ctx):
        _, fn = get_activation(self.act)
        if ctx.observer is not None:
            ctx.observer(ctx.path, x)
        if "wq" in params:  # int8 deploy form (infer/quant.py)
            from yolo_series_tpu.infer.quant import int8_conv
            y = int8_conv(x.astype(jnp.float32), params["wq"], params["sw"],
                          params["b"], self.s, autopad(self.k, self.p),
                          self.g, params.get("sx"))
            return fn(y).astype(x.dtype), state
        y = conv2d(x, params["w"], self.s, autopad(self.k, self.p), self.g, ctx.dtype)
        if "bn" in params:
            y, bns = batch_norm(params["bn"], state["bn"], y, ctx)
            new_state = {"bn": bns}
        else:  # fused deploy form
            y = y + params["b"].astype(y.dtype)
            new_state = state
        return fn(y), new_state


@dataclasses.dataclass(frozen=True)
class PlainConv(Block):
    """Bare nn.Conv2d with bias (used for detect-head 1x1 convs)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        fan_in = (self.c1 // self.g) * self.k * self.k
        return {
            "w": conv_kernel_init(k1, self.k, self.k, self.c1 // self.g, self.c2),
            "b": conv_bias_init(k2, self.c2, fan_in),
        }, {}

    def apply(self, params, state, x, ctx):
        pad = self.p if self.p is not None else 0
        if ctx.observer is not None:
            ctx.observer(ctx.path, x)
        if "wq" in params:
            from yolo_series_tpu.infer.quant import int8_conv
            y = int8_conv(x.astype(jnp.float32), params["wq"], params["sw"],
                          params["b"], self.s, pad, self.g, params.get("sx"))
            return y.astype(x.dtype), state
        y = conv2d(x, params["w"], self.s, pad, self.g, ctx.dtype)
        return y + params["b"].astype(y.dtype), state


def DWConv(c1, c2, k=1, s=1, act=True):
    """Depthwise conv (reference common.py:147): groups = gcd(c1, c2)."""
    return ConvBnAct(c1, c2, k, s, None, math.gcd(c1, c2), act)


@dataclasses.dataclass(frozen=True)
class MP(Block):
    """MaxPool k=s (reference common.py:30); default 2x2/2 downsample."""

    c1: int
    k: int = 2

    @property
    def cout(self):
        return self.c1

    @property
    def stride_factor(self):
        return float(self.k)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return max_pool(x, self.k, self.k, 0), state


@dataclasses.dataclass(frozen=True)
class SP(Block):
    """Stride-1 same-pad MaxPool (reference common.py:39)."""

    c1: int
    k: int = 3
    s: int = 1

    @property
    def cout(self):
        return self.c1

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return max_pool(x, self.k, self.s, self.k // 2), state


@dataclasses.dataclass(frozen=True)
class ReOrg(Block):
    """Space-to-depth 2x (reference common.py:48): (b,h,w,c)->(b,h/2,w/2,4c).

    Channel order matches the reference's NCHW slicing
    [::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2] on (h, w).
    """

    c1: int

    @property
    def cout(self):
        return self.c1 * 4

    stride_factor = 2.0

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        y = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1)
        return y, state


@dataclasses.dataclass(frozen=True)
class Upsample(Block):
    """nn.Upsample nearest, integer scale."""

    c1: int
    scale: int = 2

    @property
    def cout(self):
        return self.c1

    @property
    def stride_factor(self):
        return 1.0 / self.scale

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        y = jnp.repeat(jnp.repeat(x, self.scale, axis=1), self.scale, axis=2)
        return y, state


@dataclasses.dataclass(frozen=True)
class Concat(Block):
    """Channel concat of the routed inputs (reference common.py:56)."""

    cins: Tuple[int, ...]

    @property
    def cout(self):
        return sum(self.cins)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, xs, ctx):
        return jnp.concatenate(list(xs), axis=-1), state


@dataclasses.dataclass(frozen=True)
class Chuncat(Block):
    """Split each input in half on channels, concat firsts then seconds
    (reference common.py:64-77)."""

    cins: Tuple[int, ...]

    @property
    def cout(self):
        return sum(self.cins)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, xs, ctx):
        firsts, seconds = [], []
        for xi in xs:
            c = xi.shape[-1] // 2
            firsts.append(xi[..., :c])
            seconds.append(xi[..., c:])
        return jnp.concatenate(firsts + seconds, axis=-1), state


@dataclasses.dataclass(frozen=True)
class Shortcut(Block):
    """Elementwise add of two routed inputs (reference common.py:80)."""

    cins: Tuple[int, ...]

    @property
    def cout(self):
        return self.cins[0]

    def init(self, key):
        return {}, {}

    def apply(self, params, state, xs, ctx):
        return xs[0] + xs[1], state


@dataclasses.dataclass(frozen=True)
class Foldcut(Block):
    """Split channels in half and add (reference common.py:89)."""

    c1: int

    @property
    def cout(self):
        return self.c1 // 2

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        c = x.shape[-1] // 2
        return x[..., :c] + x[..., c:], state


@dataclasses.dataclass(frozen=True)
class Focus(Block):
    """Space-to-depth + conv (reference common.py:796-806). Slice order
    matches the reference: [..., ::2, ::2], [..., 1::2, ::2], ... on (h, w)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Any = True

    @property
    def cout(self):
        return self.c2

    stride_factor = 2.0

    def _conv(self):
        return ConvBnAct(self.c1 * 4, self.c2, self.k, self.s, self.p, self.g, self.act)

    def init(self, key):
        return self._conv().init(key)

    def apply(self, params, state, x, ctx):
        y = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1)
        return self._conv().apply(params, state, y, ctx)


@dataclasses.dataclass(frozen=True)
class Contract(Block):
    """(b, h, w, c) -> (b, h/g, w/g, c*g^2) (reference common.py:824)."""

    c1: int
    gain: int = 2

    @property
    def cout(self):
        return self.c1 * self.gain**2

    @property
    def stride_factor(self):
        return float(self.gain)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        b, h, w, c = x.shape
        g = self.gain
        y = x.reshape(b, h // g, g, w // g, g, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // g, w // g, g * g * c)
        return y, state


@dataclasses.dataclass(frozen=True)
class Expand(Block):
    """Inverse of Contract (reference common.py:837)."""

    c1: int
    gain: int = 2

    @property
    def cout(self):
        return self.c1 // self.gain**2

    @property
    def stride_factor(self):
        return 1.0 / self.gain

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        b, h, w, c = x.shape
        g = self.gain
        y = x.reshape(b, h, w, g, g, c // (g * g))
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * g, w * g, c // (g * g))
        return y, state


# ---------------------------------------------------------------------------
# composite conv blocks


@dataclasses.dataclass(frozen=True)
class GhostConv(Composite):
    """Ghost convolution (reference common.py:152-162)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    def children(self):
        c_ = self.c2 // 2
        return {
            "cv1": ConvBnAct(self.c1, c_, self.k, self.s, None, self.g, self.act),
            "cv2": ConvBnAct(c_, c_, 5, 1, None, c_, self.act),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y = call("cv1", x)
        out = jnp.concatenate([y, call("cv2", y)], axis=-1)
        return out, ns


@dataclasses.dataclass(frozen=True)
class Stem(Composite):
    """4x-downsampling stem (reference common.py:165-178)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Any = True

    @property
    def cout(self):
        return self.c2

    stride_factor = 4.0

    def children(self):
        c_ = int(self.c2 / 2)
        return {
            "cv1": ConvBnAct(self.c1, c_, 3, 2),
            "cv2": ConvBnAct(c_, c_, 1, 1),
            "cv3": ConvBnAct(c_, c_, 3, 2),
            "cv4": ConvBnAct(2 * c_, self.c2, 1, 1),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        x = call("cv1", x)
        pooled = max_pool(x, 2, 2, 0)
        y = call("cv4", jnp.concatenate([call("cv3", call("cv2", x)), pooled], -1))
        return y, ns


@dataclasses.dataclass(frozen=True)
class DownC(Composite):
    """Conv + maxpool downsample pair (reference common.py:181-192)."""

    c1: int
    c2: int
    n: int = 1
    k: int = 2

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.k)

    def children(self):
        return {
            "cv1": ConvBnAct(self.c1, self.c1, 1, 1),
            "cv2": ConvBnAct(self.c1, self.c2 // 2, 3, self.k),
            "cv3": ConvBnAct(self.c1, self.c2 // 2, 1, 1),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        a = call("cv2", call("cv1", x))
        b = call("cv3", max_pool(x, self.k, self.k, 0))
        return jnp.concatenate([a, b], -1), ns


@dataclasses.dataclass(frozen=True)
class SPP(Composite):
    """Spatial pyramid pooling (reference common.py:195-206)."""

    c1: int
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)

    @property
    def cout(self):
        return self.c2

    def children(self):
        c_ = self.c1 // 2
        return {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(c_ * (len(self.k) + 1), self.c2, 1, 1),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        x = call("cv1", x)
        pools = max_pool_pyramid(x, self.k)
        return call("cv2", jnp.concatenate([x] + pools, -1)), ns


@dataclasses.dataclass(frozen=True)
class SPPF(Composite):
    """Fast SPP: 3 chained k-pools (reference common.py:808-821)."""

    c1: int
    c2: int
    k: int = 5

    @property
    def cout(self):
        return self.c2

    def children(self):
        c_ = self.c1 // 2
        return {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(c_ * 4, self.c2, 1, 1),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        x = call("cv1", x)
        y1 = max_pool(x, self.k, 1, self.k // 2)
        y2 = max_pool(y1, self.k, 1, self.k // 2)
        y3 = max_pool(y2, self.k, 1, self.k // 2)
        return call("cv2", jnp.concatenate([x, y1, y2, y3], -1)), ns


@dataclasses.dataclass(frozen=True)
class SPPCSPC(Composite):
    """The YOLOv7 neck block: CSP-wrapped SPP (reference common.py:260-280)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: Tuple[int, ...] = (5, 9, 13)

    @property
    def cout(self):
        return self.c2

    def children(self):
        c_ = int(2 * self.c2 * self.e)
        return {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(self.c1, c_, 1, 1),
            "cv3": ConvBnAct(c_, c_, 3, 1),
            "cv4": ConvBnAct(c_, c_, 1, 1),
            "cv5": ConvBnAct(4 * c_, c_, 1, 1),
            "cv6": ConvBnAct(c_, c_, 3, 1),
            "cv7": ConvBnAct(2 * c_, self.c2, 1, 1),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        x1 = call("cv4", call("cv3", call("cv1", x)))
        pools = max_pool_pyramid(x1, self.k)
        y1 = call("cv6", call("cv5", jnp.concatenate([x1] + pools, -1)))
        y2 = call("cv2", x)
        return call("cv7", jnp.concatenate([y1, y2], -1)), ns


# ---------------------------------------------------------------------------
# residual families


@dataclasses.dataclass(frozen=True)
class Bottleneck(Composite):
    """Darknet bottleneck (reference common.py:209-219)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @property
    def cout(self):
        return self.c2

    def children(self):
        c_ = int(self.c2 * self.e)
        return {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(c_, self.c2, 3, 1, None, self.g),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y = call("cv2", call("cv1", x))
        if self.shortcut and self.c1 == self.c2:
            y = x + y
        return y, ns


@dataclasses.dataclass(frozen=True)
class Res(Composite):
    """ResNet bottleneck (reference common.py:222-234)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @property
    def cout(self):
        return self.c2

    def children(self):
        c_ = int(self.c2 * self.e)
        return {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(c_, c_, 3, 1, None, self.g),
            "cv3": ConvBnAct(c_, self.c2, 1, 1),
        }

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y = call("cv3", call("cv2", call("cv1", x)))
        if self.shortcut and self.c1 == self.c2:
            y = x + y
        return y, ns


def ResX(c1, c2, shortcut=True, g=32, e=0.5):
    """ResNeXt bottleneck (reference common.py:237-241)."""
    return Res(c1, c2, shortcut, g, e)


@dataclasses.dataclass(frozen=True)
class Ghost(Composite):
    """Ghost bottleneck (reference common.py:244-255)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1

    @property
    def cout(self):
        return self.c2

    @property
    def stride_factor(self):
        return float(self.s)

    def children(self):
        c_ = self.c2 // 2
        kids = {
            "conv0": GhostConv(self.c1, c_, 1, 1),
            "conv2": GhostConv(c_, self.c2, 1, 1, act=False),
        }
        if self.s == 2:
            kids["conv1"] = DWConv(c_, c_, self.k, self.s, act=False)
            kids["short_dw"] = DWConv(self.c1, self.c1, self.k, self.s, act=False)
            kids["short_pw"] = ConvBnAct(self.c1, self.c2, 1, 1, act=False)
        return kids

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y = call("conv0", x)
        if self.s == 2:
            y = call("conv1", y)
        y = call("conv2", y)
        if self.s == 2:
            sc = call("short_pw", call("short_dw", x))
        else:
            sc = x
        return y + sc, ns


# CSP wrappers — the A/B/C variants differ only in the stem/route topology
# (reference common.py:307-354) and the inner block family
# (ResCSP* common.py:357-398, ResXCSP* common.py:401-426, GhostCSP*).


def _seq_children(blocks: Sequence[Block], prefix="m"):
    return {f"{prefix}{i}": b for i, b in enumerate(blocks)}


@dataclasses.dataclass(frozen=True)
class _CSPBase(Composite):
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @property
    def cout(self):
        return self.c2

    def inner(self, c_) -> Sequence[Block]:
        raise NotImplementedError

    def _hidden(self):
        raise NotImplementedError


class _CSPA(_CSPBase):
    """Topology A: two parallel stems on x; inner chain on stem1."""

    def _hidden(self):
        return int(self.c2 * self.e)

    def children(self):
        c_ = self._hidden()
        kids = {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(self.c1, c_, 1, 1),
            "cv3": ConvBnAct(2 * c_, self.c2, 1, 1),
        }
        kids.update(_seq_children(self.inner(c_)))
        return kids

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y1 = call("cv1", x)
        for i in range(self.n):
            y1 = call(f"m{i}", y1)
        y2 = call("cv2", x)
        return call("cv3", jnp.concatenate([y1, y2], -1)), ns


class _CSPB(_CSPBase):
    """Topology B: single stem, split after (hidden = c2, not c2*e)."""

    def _hidden(self):
        return int(self.c2)

    def children(self):
        c_ = self._hidden()
        kids = {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(c_, c_, 1, 1),
            "cv3": ConvBnAct(2 * c_, self.c2, 1, 1),
        }
        kids.update(_seq_children(self.inner(c_)))
        return kids

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        x1 = call("cv1", x)
        y1 = x1
        for i in range(self.n):
            y1 = call(f"m{i}", y1)
        y2 = call("cv2", x1)
        return call("cv3", jnp.concatenate([y1, y2], -1)), ns


class _CSPC(_CSPBase):
    """Topology C: like A plus a transition conv on the inner branch."""

    def _hidden(self):
        return int(self.c2 * self.e)

    def children(self):
        c_ = self._hidden()
        kids = {
            "cv1": ConvBnAct(self.c1, c_, 1, 1),
            "cv2": ConvBnAct(self.c1, c_, 1, 1),
            "cv3": ConvBnAct(c_, c_, 1, 1),
            "cv4": ConvBnAct(2 * c_, self.c2, 1, 1),
        }
        kids.update(_seq_children(self.inner(c_)))
        return kids

    def apply(self, params, state, x, ctx):
        call, ns = self._run(params, state, ctx)
        y1 = call("cv1", x)
        for i in range(self.n):
            y1 = call(f"m{i}", y1)
        y1 = call("cv3", y1)
        y2 = call("cv2", x)
        return call("cv4", jnp.concatenate([y1, y2], -1)), ns


class BottleneckCSPA(_CSPA):
    def inner(self, c_):
        return [Bottleneck(c_, c_, self.shortcut, self.g, e=1.0) for _ in range(self.n)]


class BottleneckCSPB(_CSPB):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)

    def inner(self, c_):
        return [Bottleneck(c_, c_, self.shortcut, self.g, e=1.0) for _ in range(self.n)]


class BottleneckCSPC(_CSPC):
    def inner(self, c_):
        return [Bottleneck(c_, c_, self.shortcut, self.g, e=1.0) for _ in range(self.n)]


class ResCSPA(_CSPA):
    def inner(self, c_):
        return [Res(c_, c_, self.shortcut, self.g, e=0.5) for _ in range(self.n)]


class ResCSPB(_CSPB):
    def inner(self, c_):
        return [Res(c_, c_, self.shortcut, self.g, e=0.5) for _ in range(self.n)]


class ResCSPC(_CSPC):
    def inner(self, c_):
        return [Res(c_, c_, self.shortcut, self.g, e=0.5) for _ in range(self.n)]


class ResXCSPA(_CSPA):
    def __init__(self, c1, c2, n=1, shortcut=True, g=32, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)

    def inner(self, c_):
        return [Res(c_, c_, self.shortcut, self.g, e=1.0) for _ in range(self.n)]


class ResXCSPB(_CSPB):
    def __init__(self, c1, c2, n=1, shortcut=True, g=32, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)

    def inner(self, c_):
        return [Res(c_, c_, self.shortcut, self.g, e=1.0) for _ in range(self.n)]


class ResXCSPC(_CSPC):
    def __init__(self, c1, c2, n=1, shortcut=True, g=32, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)

    def inner(self, c_):
        return [Res(c_, c_, self.shortcut, self.g, e=1.0) for _ in range(self.n)]


class GhostCSPA(_CSPA):
    def inner(self, c_):
        return [Ghost(c_, c_) for _ in range(self.n)]


class GhostCSPB(_CSPB):
    def inner(self, c_):
        return [Ghost(c_, c_) for _ in range(self.n)]


class GhostCSPC(_CSPC):
    def inner(self, c_):
        return [Ghost(c_, c_) for _ in range(self.n)]


# ---------------------------------------------------------------------------
# re-parameterizable conv & implicit knowledge


@dataclasses.dataclass(frozen=True)
class RepConv(Composite):
    """RepVGG-style conv (reference common.py:463-507).

    Train form: 3x3+BN, 1x1+BN, (identity BN when c1==c2 and s==1); deploy
    form (after `yolo_series_tpu.models.reparam.fuse_repconv`): single 3x3
    conv + bias stored as {"w", "b"}.
    """

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Any = True

    def __post_init__(self):
        assert self.k == 3 and autopad(self.k, self.p) == 1

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
        k1, k2 = jax.random.split(key)
        bnd_p, bnd_s = bn_init(self.c2)
        bn1_p, bn1_s = bn_init(self.c2)
        params = {
            "dense": {"w": conv_kernel_init(k1, 3, 3, self.c1 // self.g, self.c2), "bn": bnd_p},
            "one": {"w": conv_kernel_init(k2, 1, 1, self.c1 // self.g, self.c2), "bn": bn1_p},
        }
        state = {"dense": {"bn": bnd_s}, "one": {"bn": bn1_s}}
        if self.has_identity:
            idp, ids = bn_init(self.c1)
            params["idbn"] = idp
            state["idbn"] = ids
        return params, state

    def children(self):
        return {}

    def apply(self, params, state, x, ctx):
        _, fn = get_activation(self.act)
        if ctx.observer is not None:
            ctx.observer(ctx.path, x)
        if "wq" in params:  # int8 deploy form
            from yolo_series_tpu.infer.quant import int8_conv
            y = int8_conv(x.astype(jnp.float32), params["wq"], params["sw"],
                          params["b"], self.s, 1, self.g, params.get("sx"))
            return fn(y).astype(x.dtype), state
        if "w" in params:  # fused deploy form
            y = conv2d(x, params["w"], self.s, 1, self.g, ctx.dtype)
            return fn(y + params["b"].astype(y.dtype)), state
        new_state = dict(state)
        yd = conv2d(x, params["dense"]["w"], self.s, 1, self.g, ctx.dtype)
        yd, new_state["dense"] = (
            lambda r: (r[0], {"bn": r[1]}))(batch_norm(params["dense"]["bn"], state["dense"]["bn"], yd, ctx))
        y1 = conv2d(x, params["one"]["w"], self.s, 0, self.g, ctx.dtype)
        y1, bn1s = batch_norm(params["one"]["bn"], state["one"]["bn"], y1, ctx)
        new_state["one"] = {"bn": bn1s}
        y = yd + y1
        if self.has_identity:
            yid, idbs = batch_norm(params["idbn"], state["idbn"], x, ctx)
            new_state["idbn"] = idbs
            y = y + yid
        return fn(y), new_state


@dataclasses.dataclass(frozen=True)
class ImplicitA(Block):
    """Learned additive prior, init N(0, 0.02) (reference common.py:433)."""

    c: int

    @property
    def cout(self):
        return self.c

    def init(self, key):
        return {"v": 0.02 * jax.random.normal(key, (self.c,), jnp.float32)}, {}

    def apply(self, params, state, x, ctx):
        return x + params["v"].astype(x.dtype), state


@dataclasses.dataclass(frozen=True)
class ImplicitM(Block):
    """Learned multiplicative prior, init N(1, 0.02) (reference common.py:446)."""

    c: int

    @property
    def cout(self):
        return self.c

    def init(self, key):
        return {"v": 1.0 + 0.02 * jax.random.normal(key, (self.c,), jnp.float32)}, {}

    def apply(self, params, state, x, ctx):
        return x * params["v"].astype(x.dtype), state


@dataclasses.dataclass(frozen=True)
class BatchNorm2d(Block):
    """Standalone BN layer (nn.BatchNorm2d rows in baseline cfgs)."""

    c1: int

    @property
    def cout(self):
        return self.c1

    def init(self, key):
        p, s = bn_init(self.c1)
        return p, s

    def apply(self, params, state, x, ctx):
        return batch_norm(params, state, x, ctx)
