"""Fused stem tail as a single Pallas TPU kernel (serving deploy form).

The P5 stem (cfg deploy/yolov7.yaml layers 0-3: k3/s1 3->32, k3/s2
32->64, k3/s1 64->64, k3/s2 64->128 — reference common.py Conv,
yolo.py parse_model) is HBM-bandwidth-bound on TPU: after the
phase-space fold (models/faststem.py) XLA still round-trips ~2.7 GB
per bs32@640 batch between the four convs, and the profiled stem time
(10.8 ms) sits far above the ~4.5 ms HBM floor.

This transform keeps the first fold (the lane-hostile 3-channel conv
becomes ONE k4/s2 phase conv XLA handles well: its 4-phase output
stacks to 4*c0 = full 128 lanes) and fuses EVERYTHING AFTER IT — the
k2 phase-consume conv, the k3/s1 conv, and the k3/s2 conv — into one
Pallas kernel whose intermediates never touch HBM: per batch the tail
costs one 840 MB read + one 210 MB write instead of XLA's 2.5 GB.

Conv-as-matmul machinery follows ops/pallas_elan.py: W-shifted patch
stores into VMEM scratch, one MXU dot per H tap, per-stage boundary-row
re-zeroing so every stage reproduces its own zero padding exactly. The
H-stride-2 of the last conv becomes a stride-2 slice on the (leading)
row axis of the patch. The W-stride-2 is handled by keeping the WHOLE
kernel in a W-phase-packed layout: the input arrives as
(rows, W/2, 2*C1) — a free XLA bitcast of the NHWC (rows, W, C1)
tensor, done outside the kernel — and stages S1/S2 compute even/odd-W
outputs side by side in the sublane axis ([0:W/2] = even, [W/2:] =
odd), so every W-neighbor access is a stride-1 offset slice of the
packed value and S3 simply consumes the even/odd halves. Mosaic cannot
lower minor-dim reshapes or sublane-strided slices (the first kernel
shape, which reshaped (rows, W, c) -> (rows, W/2, 2c) INSIDE the
kernel, failed layout inference on the real chip); this form needs
neither.

Applied by `make_pallas_stem` after `fuse_model`, replacing
`make_fast_stem` for the serving path (training keeps the phase-fold,
models/faststem.make_train_fast_stem). Off-TPU the block runs an XLA
chain with identical semantics; YOLO_TPU_PALLAS_INTERPRET=1 runs the
kernel in interpret mode (CPU correctness tests).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolo_series_tpu.models.faststem import (PhasedConv, _Passthrough,
                                             _phase_weights)
from yolo_series_tpu.models.graph import GraphPlan
from yolo_series_tpu.models.layers import Block, ConvBnAct
from yolo_series_tpu.ops.pallas_elan import _dot, _interpret, _silu

# x-block halo rows: S1 (k2, pad (1,0)) needs 1 above; S2 (k3) 1 each;
# S3 (k3/s2) 1 each -> 3 above, 2 below; symmetric 3 keeps indexing simple
_PAD = 3


def _s3_variant() -> str:
    import os

    return os.environ.get("YOLO_TPU_STEM_S3", "evenodd")


def _th_override():
    import os

    v = os.environ.get("YOLO_TPU_STEM_TH")
    return int(v) if v else None


@functools.lru_cache(maxsize=16)
def _make_stem_call(HX, W, C1, CM, COUT, TH, interpret, s3_variant="refstride"):
    """Kernel over the k4s2 phase conv's output x, W-phase-packed to
    (B, HX + 2*_PAD, W/2, 2*C1) with zero halo rows (xp[..., ow, 0:C1] =
    x[..., 2ow, :], xp[..., ow, C1:] = x[..., 2ow+1, :]); returns
    (B, HX//2, W//2, COUT).

    C1: phase channels (4*c0, e.g. 128); CM: mid width (e.g. 64);
    COUT: final channels (e.g. 128). TH: output tile rows (at HX//2 res).
    """
    R = 2 * TH + 2 * _PAD  # x rows per block (needs 2*TH+4; +2 slack)
    Wh = W // 2

    def kernel(x_ref, wk2_ref, b1_ref, ws2_ref, b2_ref, ws3_ref, b3_ref,
               out_ref, sp1, sp2, sp3):
        h = pl.program_id(1)
        base = h * 2 * TH  # this block's first x row, unpadded-global

        def mask_rows(v, off):
            # v[j] is unpadded-global row base+off+j; zero rows outside
            # [0, HX): each conv zero-pads its OWN boundary, so silu(bias)
            # rows from the previous stage must not leak in.
            r = v.shape[0]
            gi = lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0) + (base + off)
            ok = (gi >= 0) & (gi < HX)
            return jnp.where(ok, v, jnp.zeros_like(v))

        # rows base-3 .. base+2TH+2; halo rows hold the producer conv's
        # silu(bias) values, NOT zeros (the k4s2 conv emits the halo band
        # directly to avoid a full-tensor pad copy) — zero them here so S1
        # sees its own conv zero padding
        xb = mask_rows(x_ref[:], -_PAD)  # (R, Wh, 2*C1)
        xlo = xb[:, :, 0:C1]             # x[2ow]
        xhi = xb[:, :, C1:2 * C1]        # x[2ow+1]

        # Stages S1/S2 run in packed-W form: sublane halves hold the two
        # W phases side by side ([0:Wh] = even output cols w=2ow,
        # [Wh:2Wh] = odd cols w=2ow+1), so one dot per H tap covers both
        # phases and every W-neighbor access is a stride-1 offset slice.

        # ---- S1: k2/s1, pad (1,0), C1 -> CM (the phase-consume conv) ----
        # out col w <- x cols w-1 (patch block 0), w (block 1)
        # even w=2ow: x[2ow-1]=xhi[ow-1], x[2ow]=xlo[ow]
        sp1[:, 1:Wh, 0:C1] = xhi[:, 0:Wh - 1, :]
        sp1[:, 0:1, 0:C1] = jnp.zeros((R, 1, C1), jnp.bfloat16)
        sp1[:, 0:Wh, C1:2 * C1] = xlo
        # odd w=2ow+1: x[2ow]=xlo[ow], x[2ow+1]=xhi[ow]
        sp1[:, Wh:2 * Wh, 0:C1] = xlo
        sp1[:, Wh:2 * Wh, C1:2 * C1] = xhi
        n1 = R - 1  # S1 local i -> global row t = base + i - 2
        a1 = _dot(sp1[0:n1], wk2_ref[0])      # x row t-1 (local i)
        a1 += _dot(sp1[1:n1 + 1], wk2_ref[1])  # x row t   (local i+1)
        s1 = _silu(a1 + b1_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        s1 = mask_rows(s1, -2)                 # (n1, 2*Wh, CM)
        s1lo = s1[:, 0:Wh, :]
        s1hi = s1[:, Wh:2 * Wh, :]

        # ---- S2: k3/s1, pad 1, CM -> CM (packed-W, taps -1/0/+1) ----
        z = jnp.zeros((n1, 1, CM), jnp.bfloat16)
        # even w=2ow: s1[2ow-1]=hi[ow-1], s1[2ow]=lo[ow], s1[2ow+1]=hi[ow]
        sp2[0:n1, 1:Wh, 0:CM] = s1hi[:, 0:Wh - 1, :]
        sp2[0:n1, 0:1, 0:CM] = z
        sp2[0:n1, 0:Wh, CM:2 * CM] = s1lo
        sp2[0:n1, 0:Wh, 2 * CM:3 * CM] = s1hi
        # odd w=2ow+1: s1[2ow]=lo[ow], s1[2ow+1]=hi[ow], s1[2ow+2]=lo[ow+1]
        sp2[0:n1, Wh:2 * Wh, 0:CM] = s1lo
        sp2[0:n1, Wh:2 * Wh, CM:2 * CM] = s1hi
        sp2[0:n1, Wh:2 * Wh - 1, 2 * CM:3 * CM] = s1lo[:, 1:Wh, :]
        sp2[0:n1, 2 * Wh - 1:2 * Wh, 2 * CM:3 * CM] = z
        n2 = n1 - 2  # S2 local m -> global row q = base + m - 1
        a2 = _dot(sp2[0:n2], ws2_ref[0])
        a2 += _dot(sp2[1:n2 + 1], ws2_ref[1])
        a2 += _dot(sp2[2:n2 + 2], ws2_ref[2])
        s2 = _silu(a2 + b2_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        s2 = mask_rows(s2, -1)                 # (n2, 2*Wh, CM)
        s2lo = s2[:, 0:Wh, :]
        s2hi = s2[:, Wh:2 * Wh, :]

        # ---- S3: k3/s2, pad 1, CM -> COUT — only even cols survive ----
        # patch col blocks by W tap: dx=-1 -> s2[2ow-1] = s2hi[ow-1],
        # dx=0 -> s2lo[ow], dx=+1 -> s2hi[ow]
        sp3[:, 1:Wh, 0:CM] = s2hi[:, 0:Wh - 1, :]
        sp3[:, 0:1, 0:CM] = jnp.zeros((n2, 1, CM), jnp.bfloat16)
        sp3[:, :, CM:2 * CM] = s2lo
        sp3[:, :, 2 * CM:3 * CM] = s2hi
        # H taps: out local u (global p = base//2 + u) <- S2 rows 2p-1+dy
        # = local m = 2u + dy — a stride-2 access on the leading (row)
        # axis. Mosaic rejects stride-2 vector.extract_strided_slice
        # (valstride failed verification on the real chip), so the default
        # 'evenodd' form reads an even count of rows and splits parity by
        # a LEADING-dim reshape (layout-free: minor (Wh, 3CM) dims are
        # untouched) — every slice is then stride-1:
        #   dy=0 -> even rows 0..2TH-2, dy=1 -> odd 1..2TH-1,
        #   dy=2 -> even 2..2TH.
        # refstride/valstride kept behind YOLO_TPU_STEM_S3 for experiments.
        if s3_variant == "evenodd":
            p3 = sp3[0:2 * TH + 2].reshape(TH + 1, 2, Wh, 3 * CM)
            pe = p3[:, 0]  # sp3 rows 0,2,...,2TH
            po = p3[:, 1]  # sp3 rows 1,3,...,2TH+1
            acc = _dot(pe[0:TH], ws3_ref[0])
            acc += _dot(po[0:TH], ws3_ref[1])
            acc += _dot(pe[1:TH + 1], ws3_ref[2])
        elif s3_variant == "valstride":
            p3 = sp3[0:2 * TH + 1]
            acc = _dot(lax.slice(p3, (0, 0, 0), (2 * TH - 1, Wh, 3 * CM),
                                 (2, 1, 1)), ws3_ref[0])
            acc += _dot(lax.slice(p3, (1, 0, 0), (2 * TH, Wh, 3 * CM),
                                  (2, 1, 1)), ws3_ref[1])
            acc += _dot(lax.slice(p3, (2, 0, 0), (2 * TH + 1, Wh, 3 * CM),
                                  (2, 1, 1)), ws3_ref[2])
        else:
            acc = _dot(sp3[0:2 * TH - 1:2], ws3_ref[0])
            acc += _dot(sp3[1:2 * TH:2], ws3_ref[1])
            acc += _dot(sp3[2:2 * TH + 1:2], ws3_ref[2])
        y = _silu(acc + b3_ref[:].astype(jnp.float32))
        out_ref[:] = y.astype(jnp.bfloat16)

    def call(xp, args):
        B = xp.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, HX // 2, W // 2, COUT),
                                           jnp.bfloat16),
            grid=(B, (HX // 2) // TH),
            in_specs=[
                pl.BlockSpec(
                    (None, pl.Element(R), pl.Element(Wh), pl.Element(2 * C1)),
                    index_map=lambda b, h: (b, h * 2 * TH, 0, 0),
                    memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((None, TH, Wh, COUT),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((R, 2 * Wh, 2 * C1), jnp.bfloat16),
                pltpu.VMEM((R - 1, 2 * Wh, 3 * CM), jnp.bfloat16),
                pltpu.VMEM((R - 3, Wh, 3 * CM), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xp, *args)

    return call


def _pick_th(hx: int, w: int, c1: int, cm: int, cout: int) -> int:
    """Largest output tile height dividing hx//2 whose scratch fits VMEM."""
    budget = 72 * 1024 * 1024
    for th in range(min(hx // 2, 80), 3, -1):
        if (hx // 2) % th:
            continue
        r = 2 * th + 2 * _PAD
        need = 2 * (r * w * (c1 + 2 * c1)            # x block + sp1
                    + (r - 1) * w * (cm + 3 * cm)    # s1 value + sp2
                    + (r - 3) * w * (2 * cm)         # s2 value + packed
                    + (r - 3) * (w // 2) * 3 * cm)   # sp3
        need += th * (w // 2) * cout * 6             # fp32 acc + bf16 out
        if need <= budget:
            return th
    return 0


@dataclasses.dataclass(frozen=True)
class FusedStem(Block):
    """Stem tail (k2 phase-consume + k3/s1 + k3/s2) as one kernel.

    Params: {wk2 (2, 2*C1, CM), b1, ws2 (3, 3*CM, CM), b2,
    ws3 (3, 3*CM, COUT), b3} — H-tap-major packed matmul forms (bf16).
    ws3's K blocks are W-tap-major (dx=-1, 0, +1), matching the
    phase-packed patch layout. Off-TPU: an XLA chain with identical
    semantics.
    """

    c1: int     # input channels (4*c0 phase stack)
    cm: int     # mid width
    c2: int     # output channels

    @property
    def cout(self):
        return self.c2

    stride_factor = 2.0

    def init(self, key):
        raise NotImplementedError("FusedStem params come from make_pallas_stem")

    def _ref_apply(self, p, x, dtype):
        """XLA fallback with identical semantics (k2 pad(1,0) unpacked from
        wk2; k3 convs unpacked from the tap-major forms). Input arrives
        with the _PAD-row halo band the producer conv emits — crop it."""
        x = x[:, _PAD:-_PAD]
        def cv(v, wp, b, stride, pad, wtap_major):
            kh = wp.shape[0]
            cw = wp.shape[1] // kh if not wtap_major else wp.shape[1] // 3
            if wtap_major:  # (3, 3*cw, co) -> (3, 3, cw, co)
                w = wp.reshape(kh, 3, cw, wp.shape[2])
            else:           # (2, 2*cw, co) -> (2, 2, cw, co)
                w = wp.reshape(kh, kh, cw, wp.shape[2])
            dn = lax.conv_dimension_numbers(v.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                v.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (stride, stride), pad, dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16).astype(dtype)
            return _silu(y + b.astype(dtype))

        s1 = cv(x, p["wk2"], p["b1"], 1, [(1, 0), (1, 0)], False)
        s2 = cv(s1, p["ws2"], p["b2"], 1, [(1, 1), (1, 1)], True)
        return cv(s2, p["ws3"], p["b3"], 2, [(1, 1), (1, 1)], True)

    def apply(self, params, state, x, ctx):
        # x arrives pre-padded with _PAD halo rows top+bottom (the k4s2
        # phase conv emits them, make_pallas_stem): real height = HX
        _, hp_, W, _ = x.shape
        HX = hp_ - 2 * _PAD
        interp = _interpret()
        th = _th_override() or _pick_th(HX, W, self.c1, self.cm, self.c2)
        use_pallas = (interp or jax.default_backend() == "tpu") and th > 0 \
            and HX % 2 == 0 and W % 2 == 0 and (HX // 2) % th == 0
        if not use_pallas:
            return self._ref_apply(params, x, ctx.dtype), state
        call = _make_stem_call(HX, W, self.c1, self.cm, self.c2, th, interp,
                               _s3_variant())
        args = tuple(params[k].astype(jnp.bfloat16) for k in
                     ("wk2", "b1", "ws2", "b2", "ws3", "b3"))
        # W-phase pack (W, C1) -> (W/2, 2*C1): adjacent in NHWC memory, so
        # this is a free bitcast for XLA; the kernel never reshapes (Mosaic
        # cannot lower minor-dim shape casts on this chip)
        xp = x.astype(jnp.bfloat16).reshape(
            x.shape[0], x.shape[1], W // 2, 2 * self.c1)
        y = call(xp, args)
        return y.astype(ctx.dtype), state


def _stem_matches(plan: GraphPlan, params) -> bool:
    """Layers 0-3 = fused ConvBnAct k3 chain (s1, s2, s1, s2), default act,
    no external refs into 0-2, none of 0-2 in save."""
    if len(plan.layers) < 5:
        return False
    lp = params["layers"]
    want_s = (1, 2, 1, 2)
    for i in range(4):
        s = plan.layers[i]
        b = s.block
        if not (isinstance(b, ConvBnAct) and b.k == 3 and b.s == want_s[i]
                and b.g == 1 and b.p is None and b.act is True
                and s.n_seq == 1 and not s.is_head
                and isinstance(lp[i], dict) and "w" in lp[i] and "b" in lp[i]
                and "bn" not in lp[i]):
            return False
        if i > 0 and s.frm != -1:
            return False
    if plan.layers[0].frm != -1:
        return False
    # channel sanity: the mid convs share width, lanes need %32 packing
    c0 = plan.layers[0].block.c2
    cm = plan.layers[1].block.c2
    if plan.layers[1].block.c1 != c0 or plan.layers[3].block.c1 != cm:
        return False
    if plan.layers[2].block.c2 != cm or plan.layers[2].block.c1 != cm:
        return False
    if (4 * c0) % 32 or cm % 32 or plan.layers[3].block.c2 % 32:
        return False
    for j, other in enumerate(plan.layers):
        if j <= 3:
            continue
        refs = other.frm if isinstance(other.frm, tuple) else (other.frm,)
        refs = tuple(r if r >= 0 else j + r for r in refs)
        if any(r <= 2 for r in refs):
            return False
    return not any(i in plan.save for i in range(3))


def _taps(w) -> jnp.ndarray:
    """(3,3,ci,co) -> (3, 3*ci, co): H-tap-major, W-shift col blocks."""
    a = np.asarray(w, np.float32)
    ci, co = a.shape[2], a.shape[3]
    out = np.zeros((3, 3 * ci, co), np.float32)
    for r in range(3):
        for c in range(3):
            out[r, c * ci:(c + 1) * ci] = a[r, c]
    return jnp.asarray(out, jnp.bfloat16)


def _k2_taps(w2: np.ndarray) -> jnp.ndarray:
    """(2,2,c1,cm) -> (2, 2*c1, cm): H-tap rows, W-shift col blocks
    (block 0 = x col w-1, block 1 = x col w)."""
    c1, cm = w2.shape[2], w2.shape[3]
    out = np.zeros((2, 2 * c1, cm), np.float32)
    for r in range(2):
        for s in range(2):
            out[r, s * c1:(s + 1) * c1] = w2[r, s]
    return jnp.asarray(out, jnp.bfloat16)


def _default_on() -> bool:
    # flips to "1" once the kernel's on-TPU timing is verified on this
    # chip (the remote Mosaic compile of the first attempt wedged the
    # dev relay for hours — keep the transform opt-in until the cached
    # compile exists); interpret mode always engages for tests
    import os

    return os.environ.get("YOLO_TPU_PALLAS_STEM", "0") == "1" or _interpret()


def make_pallas_stem(plan: GraphPlan, params, state, force: bool = False):
    """Rewrite the P5 stem (4 fused convs) into [k4/s2 phase conv,
    FusedStem, passthrough x2]. Apply after fuse_model, INSTEAD of
    make_fast_stem (it subsumes the fold). Returns inputs unchanged when
    the stem doesn't match (P6 ReOrg stems, exotic cfgs) or the
    transform is not enabled (YOLO_TPU_PALLAS_STEM; `force` overrides —
    tools/bench_kernels.py uses it for the compiler-drift A/B gate)."""
    if not (force or _default_on()) or not _stem_matches(plan, params):
        return plan, params, state
    layers = list(plan.layers)
    lp = list(params["layers"])
    ls = list(state["layers"])
    l0, l1 = layers[0].block, layers[1].block
    c0, cm = l0.c2, l1.c2
    cout = layers[3].block.c2
    w4, b4, wk2 = _phase_weights(np.asarray(lp[0]["w"], np.float32),
                                 np.asarray(lp[0]["b"], np.float32),
                                 np.asarray(lp[1]["w"], np.float32))
    # wk2 from _phase_weights is (2,2,4c0,cm) HWIO on the phase layout
    # the k4s2 phase conv emits _PAD extra output rows top+bottom (input
    # H pad 1 + 2*_PAD) — the kernel's halo band, saving a full-tensor
    # pad copy (~1.7 GB/batch at bs32@640); FusedStem masks those rows
    layers[0] = dataclasses.replace(
        layers[0], block=PhasedConv(l0.c1, 4 * c0, (4, 4), 2,
                                    ((1 + 2 * _PAD, 1 + 2 * _PAD), (1, 1)),
                                    l0.act),
        cout=4 * c0, stride=layers[0].stride * 2)
    lp[0] = {"w": jnp.asarray(w4), "b": jnp.asarray(b4)}
    ls[0] = {}
    layers[1] = dataclasses.replace(
        layers[1], block=FusedStem(4 * c0, cm, cout), cout=cout,
        stride=layers[1].stride * 2)
    lp[1] = {
        "wk2": _k2_taps(np.asarray(wk2, np.float32)),
        "b1": jnp.asarray(np.asarray(lp[1]["b"], np.float32), jnp.bfloat16),
        "ws2": _taps(lp[2]["w"]),
        "b2": jnp.asarray(np.asarray(lp[2]["b"], np.float32), jnp.bfloat16),
        "ws3": _taps(lp[3]["w"]),
        "b3": jnp.asarray(np.asarray(lp[3]["b"], np.float32), jnp.bfloat16),
    }
    ls[1] = {}
    for i in (2, 3):
        layers[i] = dataclasses.replace(
            layers[i], block=_Passthrough(cout), cout=cout, frm=-1)
        lp[i] = {}
        ls[i] = {}
    return (dataclasses.replace(plan, layers=tuple(layers)),
            {**params, "layers": lp},
            {**state, "layers": ls})
