"""Fused ELAN blocks as single Pallas TPU kernels (serving deploy form).

The ELAN aggregation blocks dominate yolov7's deploy graph (cfg
deploy/yolov7.yaml backbone layers 4-11/17-24/30-37/43-50 and the four
head ELAN-W spans; the reference expresses them as yaml subgraphs of
Conv modules, common.py:99-111). Under XLA each of the 7 convs
round-trips its activation through HBM, and the 64-channel chain
tensors of the high-resolution blocks pad to 128-lane tiles — a
profiled trace at bs32@640 shows the unfused SiLU elementwise fusions
running at ~8x their roofline time (2.14 ms vs 0.26 ms ideal on the
[32,160,160,64] chain maps) and the concat+1x1 output fusion at ~5x.

This kernel computes one whole ELAN block per grid step — two input
1x1s, the four 3x3 chain convs, the channel concat, and the output 1x1
— entirely in VMEM: HBM sees only the block input read and the final
output write. 3x3 convs are expressed as three W-shifted patch matmuls
(MXU) built in a VMEM scratch buffer; H tiling uses a 4-row halo (one
row per chain conv). Boundary semantics match the reference exactly:
every stage's rows outside the real image are re-zeroed before the next
conv consumes them, reproducing each conv's own zero padding (measured:
interior AND edge max-error vs an fp32 oracle equal to the plain XLA
bf16 chain's rounding error, ~0.016 on unit-scale activations).

Applied by `make_pallas_elan` after `fuse_model` (+ `make_fast_stem`):
a plan/params rewrite in the style of models/faststem.py. On non-TPU
backends (CPU tests, the multichip dryrun) the block falls back to an
XLA chain with identical semantics; set YOLO_TPU_PALLAS_INTERPRET=1 to
run the kernel itself in pallas interpret mode (CPU correctness tests).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolo_series_tpu.models.faststem import _Passthrough
from yolo_series_tpu.models.graph import GraphPlan
from yolo_series_tpu.models.layers import Block, Concat, ConvBnAct

_HALO = 4  # one halo row per chain conv


def _interpret() -> bool:
    return bool(int(os.environ.get("YOLO_TPU_PALLAS_INTERPRET", "0")))


def _silu(v):
    return v * jax.nn.sigmoid(v)


def _dot(a, w):
    return lax.dot_general(a, w, (((a.ndim - 1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _pick_th(h: int, w: int, cin: int, ct: int, cc: int, cout: int) -> int:
    """Largest tile height dividing h whose working set fits VMEM."""
    budget = 80 * 1024 * 1024
    for th in range(min(h, 160), 7, -1):
        if h % th:
            continue
        r = th + 2 * _HALO
        need = 2 * r * w * (cin + 3 * ct + 3 * cc + ct + 5 * cc) \
            + th * w * cout * (2 + 4)  # bf16 out + fp32 acc
        if need <= budget:
            return th
    return 0


@functools.lru_cache(maxsize=64)
def _make_elan_call(H, W, CIN, CT, CC, COUT, order, TH, interpret):
    """Build the pallas_call for one ELAN shape. order: 'backbone'|'head'.

    Input must be pre-padded with _HALO zero rows top+bottom:
    (B, H + 2*_HALO, W, CIN). Output: (B, H, W, COUT).
    """
    R = TH + 2 * _HALO

    def kernel(x_ref, w4_ref, b4_ref, w5_ref, b5_ref, wc0_ref, bc0_ref,
               wc_ref, bc_ref, w11_ref, b11_ref, out_ref, sp0, spc):
        h = pl.program_id(1)
        base = h * TH  # padded-global index of this block's first row

        def mask_rows(v, off):
            # v[j] is padded-global row base+off+j; zero rows outside the
            # image band [HALO, H+HALO): each reference conv zero-pads its
            # OWN input at the boundary, so silu(bias) halo rows from the
            # previous stage must not leak into the next conv.
            r = v.shape[0]
            gi = lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0) + (base + off)
            ok = (gi >= _HALO) & (gi < H + _HALO)
            return jnp.where(ok, v, jnp.zeros_like(v))

        def conv3(v, sp, cw, wp0, wp1, wp2, b):
            # v [r,W,cw] -> [r-2,W,CC] valid rows; 3 W-shifted patch
            # stores into scratch, one matmul per H tap.
            r = v.shape[0]
            sp[0:r, 1:W, 0:cw] = v[:, 0:W - 1, :]
            sp[0:r, :, cw:2 * cw] = v
            sp[0:r, 0:W - 1, 2 * cw:3 * cw] = v[:, 1:W, :]
            z = jnp.zeros((r, 1, cw), jnp.bfloat16)
            sp[0:r, 0:1, 0:cw] = z
            sp[0:r, W - 1:W, 2 * cw:3 * cw] = z
            acc = _dot(sp[0:r - 2], wp0)
            acc += _dot(sp[1:r - 1], wp1)
            acc += _dot(sp[2:r], wp2)
            return _silu(acc + b.astype(jnp.float32)).astype(jnp.bfloat16)

        xb = x_ref[:]                                        # [R,W,CIN]
        # x4 feeds only the concat: central TH rows suffice
        x4 = _silu(_dot(xb[_HALO:_HALO + TH], w4_ref[:])
                   + b4_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        x5 = _silu(_dot(xb, w5_ref[:])
                   + b5_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        x5 = mask_rows(x5, 0)
        c1 = mask_rows(conv3(x5, sp0, CT, wc0_ref[0], wc0_ref[1], wc0_ref[2],
                             bc0_ref[:]), 1)                 # [R-2]
        c2 = mask_rows(conv3(c1, spc, CC, wc_ref[0, 0], wc_ref[0, 1],
                             wc_ref[0, 2], bc_ref[0]), 2)    # [R-4]
        c3 = mask_rows(conv3(c2, spc, CC, wc_ref[1, 0], wc_ref[1, 1],
                             wc_ref[1, 2], bc_ref[1]), 3)    # [R-6]
        c4 = conv3(c3, spc, CC, wc_ref[2, 0], wc_ref[2, 1], wc_ref[2, 2],
                   bc_ref[2])                                # [R-8] == [TH]
        if order == "head":
            cat = jnp.concatenate(
                [c4, c3[1:TH + 1], c2[2:TH + 2], c1[3:TH + 3],
                 x5[_HALO:_HALO + TH], x4], axis=-1)
        else:
            cat = jnp.concatenate(
                [c4, c2[2:TH + 2], x5[_HALO:_HALO + TH], x4], axis=-1)
        y = _silu(_dot(cat, w11_ref[:]) + b11_ref[:].astype(jnp.float32))
        out_ref[:] = y.astype(jnp.bfloat16)

    def call(xp, args):
        B = xp.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
            grid=(B, H // TH),
            in_specs=[
                pl.BlockSpec(
                    (None, pl.Element(R), pl.Element(W), pl.Element(CIN)),
                    index_map=lambda b, h: (b, h * TH, 0, 0),
                    memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
            out_specs=pl.BlockSpec((None, TH, W, COUT),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, W, 3 * CT), jnp.bfloat16),
                            pltpu.VMEM((R, W, 3 * CC), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xp, *args)

    return call


@dataclasses.dataclass(frozen=True)
class FusedELAN(Block):
    """One ELAN span (2x 1x1 + 4-chain 3x3 + concat + 1x1) as one kernel.

    Params (packed matmul forms, bf16): {w4,b4 (layer i), w5,b5 (layer
    i+1, the chain input), wc0,bc0 (first chain conv), wc,bc (stacked
    chain convs 1..3), w11,b11 (out conv)}. Non-TPU backends take an XLA
    chain with identical semantics.
    """

    c1: int
    ct: int      # 1x1 branch width
    cc: int      # chain conv width
    c2: int      # output width
    order: str   # 'backbone' (cat c4,c2,x5,x4) | 'head' (cat c4..c1,x5,x4)

    @property
    def cout(self):
        return self.c2

    stride_factor = 1.0

    def init(self, key):
        raise NotImplementedError("FusedELAN params come from make_pallas_elan")

    def _ref_apply(self, p, x, dtype):
        """XLA fallback, semantics identical to the unfused conv chain."""
        def cv1(v, w, b):
            y = _dot(v.astype(jnp.bfloat16), w).astype(dtype)
            return _silu(y + b.astype(dtype))

        def cv3(v, wp, b):
            # wp: (3, 3*cw, cc) packed taps (tap-major rows, W-shift cols)
            cw = wp.shape[1] // 3
            w = wp.reshape(3, 3, cw, wp.shape[2])
            dn = lax.conv_dimension_numbers(v.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                v.astype(jnp.bfloat16), w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16).astype(dtype)
            return _silu(y + b.astype(dtype))

        x4 = cv1(x, p["w4"], p["b4"])
        x5 = cv1(x, p["w5"], p["b5"])
        c1 = cv3(x5, p["wc0"], p["bc0"])
        c2 = cv3(c1, p["wc"][0], p["bc"][0])
        c3 = cv3(c2, p["wc"][1], p["bc"][1])
        c4 = cv3(c3, p["wc"][2], p["bc"][2])
        if self.order == "head":
            cat = jnp.concatenate([c4, c3, c2, c1, x5, x4], axis=-1)
        else:
            cat = jnp.concatenate([c4, c2, x5, x4], axis=-1)
        return cv1(cat, p["w11"], p["b11"])

    def apply(self, params, state, x, ctx):
        _, H, W, _ = x.shape
        interp = _interpret()
        th = _pick_th(H, W, self.c1, self.ct, self.cc, self.c2)
        # Engage the kernel only where it beats XLA (measured bs32@640 on
        # v5e): the high-resolution lane-underfilled blocks (cc<=64
        # channels pad to 128-lane tiles; XLA's unfused SiLUs re-read the
        # huge maps from HBM) — bb160: 8.8 ms vs 14.0. The compact
        # full-lane blocks keep XLA (bb80 4.7 vs 4.3, bb40 4.3 vs 4.0,
        # bb20 2.5 vs 2.1): MXU-dense shapes XLA already schedules well.
        pays = self.cc <= 64 and H * W >= 96 * 96
        use_pallas = (interp or (jax.default_backend() == "tpu" and pays)) \
            and th > 0
        if not use_pallas:
            return self._ref_apply(params, x, ctx.dtype), state
        call = _make_elan_call(H, W, self.c1, self.ct, self.cc, self.c2,
                               self.order, th, interp)
        xp = jnp.pad(x.astype(jnp.bfloat16),
                     ((0, 0), (_HALO, _HALO), (0, 0), (0, 0)))
        args = (params["w4"], params["b4"], params["w5"], params["b5"],
                params["wc0"], params["bc0"], params["wc"], params["bc"],
                params["w11"], params["b11"])
        y = call(xp, tuple(a.astype(jnp.bfloat16) for a in args))
        return y.astype(ctx.dtype), state


def _is_fused_conv(spec, p, k, s):
    return (isinstance(spec.block, ConvBnAct) and spec.block.k == k
            and spec.block.s == s and spec.block.g == 1
            and spec.block.p is None and spec.block.act is True
            and spec.n_seq == 1
            and isinstance(p, dict) and "w" in p and "b" in p
            and "bn" not in p)


def find_elan_spans(plan: GraphPlan, params) -> Tuple[Tuple[int, str], ...]:
    """Yield (start_index, order) for every fusable ELAN span i..i+7."""
    layers = plan.layers
    lp = params["layers"]
    spans = []
    i = 1
    while i + 7 < len(layers):
        s = layers[i]
        ok = (_is_fused_conv(s, lp[i], 1, 1) and s.frm == -1
              and _is_fused_conv(layers[i + 1], lp[i + 1], 1, 1)
              and layers[i + 1].frm in (i - 1, -2)
              and all(_is_fused_conv(layers[i + 2 + j], lp[i + 2 + j], 3, 1)
                      and layers[i + 2 + j].frm == -1 for j in range(4))
              and isinstance(layers[i + 6].block, Concat)
              and type(layers[i + 6].block) is Concat
              and _is_fused_conv(layers[i + 7], lp[i + 7], 1, 1)
              and layers[i + 7].frm == -1)
        if not ok:
            i += 1
            continue
        frm = layers[i + 6].frm
        if frm == (-1, i + 3, i + 1, i):
            order = "backbone"
        elif frm == (-1, i + 4, i + 3, i + 2, i + 1, i):
            order = "head"
        else:
            i += 1
            continue
        cin = s.block.c1
        ct = s.block.c2
        cc = layers[i + 2].block.c2
        cat = (4 * cc + 2 * ct) if order == "head" else (2 * cc + 2 * ct)
        shapes_ok = (layers[i + 1].block.c1 == cin
                     and layers[i + 1].block.c2 == ct
                     and layers[i + 2].block.c1 == ct
                     and all(layers[i + 2 + j].block.c1 == cc
                             and layers[i + 2 + j].block.c2 == cc
                             for j in range(1, 4))
                     and layers[i + 2].block.c2 == cc
                     and layers[i + 7].block.c1 == cat
                     and cc % 32 == 0 and ct % 32 == 0 and cin % 32 == 0)
        # intermediates must not be referenced outside the span
        external = False
        for j, other in enumerate(layers):
            if i <= j <= i + 7:
                continue
            refs = other.frm if isinstance(other.frm, tuple) else (other.frm,)
            if any(i <= r <= i + 6 for r in refs):
                external = True
                break
        if shapes_ok and not external:
            spans.append((i, order))
            i += 8
        else:
            i += 1
    return tuple(spans)


def _pack_span(lp, i):
    """Params for layers i..i+7 -> FusedELAN packed dict (bf16 matmul
    forms — the unfused serving program casts weights to bf16 at conv
    time, so numerics are unchanged)."""
    def mm(w):  # (1,1,ci,co) -> (ci,co)
        a = np.asarray(w, np.float32)
        return jnp.asarray(a.reshape(a.shape[2], a.shape[3]), jnp.bfloat16)

    def taps(w):  # (3,3,ci,co) -> (3, 3*ci, co): H-tap major, W-shift cols
        a = np.asarray(w, np.float32)
        ci, co = a.shape[2], a.shape[3]
        out = np.zeros((3, 3 * ci, co), np.float32)
        for r in range(3):
            for c in range(3):
                # patch col block c holds v[w + c - 1]
                out[r, c * ci:(c + 1) * ci] = a[r, c]
        return jnp.asarray(out, jnp.bfloat16)

    def vec(b):
        return jnp.asarray(np.asarray(b, np.float32), jnp.bfloat16)

    p = [lp[i + j] for j in range(8)]
    return {
        "w4": mm(p[0]["w"]), "b4": vec(p[0]["b"]),
        "w5": mm(p[1]["w"]), "b5": vec(p[1]["b"]),
        "wc0": taps(p[2]["w"]), "bc0": vec(p[2]["b"]),
        "wc": jnp.stack([taps(p[3]["w"]), taps(p[4]["w"]), taps(p[5]["w"])]),
        "bc": jnp.stack([vec(p[3]["b"]), vec(p[4]["b"]), vec(p[5]["b"])]),
        "w11": mm(p[7]["w"]), "b11": vec(p[7]["b"]),
    }


def _elan_default_on() -> bool:
    # Default flipped OFF 2026-08-18: the remote XLA compiler improved and
    # the unfused conv chain now beats the kernel everywhere it used to
    # win (full e2e A/B on the real chip: faststem-only 35.5 ms/batch =
    # 902 img/s vs faststem+FusedELAN 43.4 ms = 737 img/s bs32@640; the
    # bb160 8.8-vs-14.0 win from the earlier compiler no longer exists).
    # Opt back in with YOLO_TPU_PALLAS_ELAN=1; interpret mode always
    # engages so the CPU suite keeps exercising the kernel.
    import os

    return os.environ.get("YOLO_TPU_PALLAS_ELAN", "0") == "1" or _interpret()


def make_pallas_elan(plan: GraphPlan, params, state, only=None, force=False):
    """Rewrite every fusable ELAN span into a FusedELAN block. Apply after
    fuse_model (+ make_fast_stem). Returns inputs unchanged if no span
    matches (training form, exotic cfgs) or the transform is not enabled
    (YOLO_TPU_PALLAS_ELAN — see _elan_default_on; `force` overrides for
    tests/experiments). `only`: optional collection of span start indices
    to restrict the rewrite (perf experiments)."""
    if not (force or _elan_default_on()):
        return plan, params, state
    spans = find_elan_spans(plan, params)
    if only is not None:
        spans = tuple(s for s in spans if s[0] in only)
    if not spans:
        return plan, params, state
    new_layers = list(plan.layers)
    lp = list(params["layers"])
    ls = list(state["layers"])
    for i, order in spans:
        blk = new_layers[i].block
        cin, ct = blk.c1, blk.c2
        cc = new_layers[i + 2].block.c2
        cout = new_layers[i + 7].block.c2
        packed = _pack_span(lp, i)
        for j in range(i, i + 7):
            new_layers[j] = dataclasses.replace(
                new_layers[j], block=_Passthrough(cin), cout=cin, frm=-1)
            lp[j] = {}
            ls[j] = {}
        new_layers[i + 7] = dataclasses.replace(
            new_layers[i + 7],
            block=FusedELAN(cin, ct, cc, cout, order), frm=-1)
        lp[i + 7] = packed
        ls[i + 7] = {}
    return (dataclasses.replace(plan, layers=tuple(new_layers)),
            {**params, "layers": lp}, {**state, "layers": ls})
