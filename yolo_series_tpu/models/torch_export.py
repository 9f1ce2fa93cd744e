"""Torch checkpoint exporter: (params, state) pytrees -> reference state_dict.

The inverse of models/torch_import.py for the common block set: lets a model
trained in this framework be loaded into the reference PyTorch `Model`
(yolo.py:508) — the interop a reference user switching frameworks needs, and
the bridge the end-to-end eval-protocol parity test drives (our trained
checkpoint evaluated by reference test.py:21-288 AND by eval/evaluator.py on
the same images must produce the same mAP).

Produces a flat {torch_key: np.ndarray} dict; conv weights transpose
HWIO -> OIHW, implicit knowledge (C,) unflattens to (1, C, 1, 1). Since
round 4 the exotic blocks (Swin v1/v2, OREPA, RobustConv, Transformer)
export too — every import mapping in torch_import.py has its inverse, so
reference-side cross-eval covers the full zoo.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from yolo_series_tpu.models import attention as ATT
from yolo_series_tpu.models import extra as X
from yolo_series_tpu.models import heads as H
from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.graph import GraphPlan
from yolo_series_tpu.models.torch_import import _child_torch_name


def _et(w) -> np.ndarray:
    """HWIO conv weight -> OIHW."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _export_bn(out: Dict[str, np.ndarray], prefix: str, p, s):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    out[f"{prefix}.running_var"] = np.asarray(s["var"])


def _export_convbn(out, prefix: str, p, s):
    """Inverse of _import_convbn: {w, bn}|{w, b} -> conv.weight (+bn.*|.bias)."""
    out[f"{prefix}.conv.weight"] = _et(p["w"])
    if "bn" in p:
        _export_bn(out, f"{prefix}.bn", p["bn"], s["bn"])
    else:
        out[f"{prefix}.conv.bias"] = np.asarray(p["b"])


def _export_repconv(out, prefix: str, p, s, block: L.RepConv):
    if "w" in p:  # fused deploy form
        out[f"{prefix}.rbr_reparam.weight"] = _et(p["w"])
        out[f"{prefix}.rbr_reparam.bias"] = np.asarray(p["b"])
        return
    out[f"{prefix}.rbr_dense.0.weight"] = _et(p["dense"]["w"])
    _export_bn(out, f"{prefix}.rbr_dense.1", p["dense"]["bn"], s["dense"]["bn"])
    out[f"{prefix}.rbr_1x1.0.weight"] = _et(p["one"]["w"])
    _export_bn(out, f"{prefix}.rbr_1x1.1", p["one"]["bn"], s["one"]["bn"])
    if block.has_identity:
        _export_bn(out, f"{prefix}.rbr_identity", p["idbn"], s["idbn"])


def _elin(out, prefix: str, p, bias: bool = True):
    """Inverse of torch_import._lin: {w:(in,out)[, b]} -> nn.Linear."""
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    if bias:
        out[f"{prefix}.bias"] = np.asarray(p["b"])


def _export_window_attention(out, prefix: str, p, blk):
    _elin(out, f"{prefix}.proj", p["proj"])
    if blk.v2:
        out[f"{prefix}.qkv.weight"] = np.ascontiguousarray(
            np.asarray(p["qkv"]["w"]).T)
        b = np.asarray(p["qkv"]["b"])
        c = b.shape[0] // 3
        if not np.allclose(b[c:2 * c], 0.0):
            # Reference v2 has NO k-bias degree of freedom (common.py:
            # 1711-1728); a nonzero k slice cannot be represented there and
            # silently dropping it would change the exported attention.
            raise ValueError(
                f"{prefix}: nonzero k-bias slice (max "
                f"{np.abs(b[c:2 * c]).max():.3e}) cannot be exported to the "
                "reference Swin v2 (k bias is structurally zero there)")
        out[f"{prefix}.q_bias"] = b[:c]
        out[f"{prefix}.v_bias"] = b[2 * c:]
        out[f"{prefix}.logit_scale"] = np.asarray(p["logit_scale"])
        _elin(out, f"{prefix}.cpb_mlp.0", p["cpb1"])
        _elin(out, f"{prefix}.cpb_mlp.2", p["cpb2"], bias=False)
    else:
        _elin(out, f"{prefix}.qkv", p["qkv"])
        out[f"{prefix}.relative_position_bias_table"] = \
            np.asarray(p["rel_bias"])


def _export_swin_layer(out, prefix: str, p, blk):
    out[f"{prefix}.norm1.weight"] = np.asarray(p["norm1"]["scale"])
    out[f"{prefix}.norm1.bias"] = np.asarray(p["norm1"]["bias"])
    out[f"{prefix}.norm2.weight"] = np.asarray(p["norm2"]["scale"])
    out[f"{prefix}.norm2.bias"] = np.asarray(p["norm2"]["bias"])
    _export_window_attention(out, f"{prefix}.attn", p["attn"], blk._attn())
    _elin(out, f"{prefix}.mlp.fc1", p["fc1"])
    _elin(out, f"{prefix}.mlp.fc2", p["fc2"])


def _export_orepa3x3(out, prefix: str, p, s, blk):
    """Inverse of torch_import._import_orepa3x3. The fixed buffers
    (weight_rbr_avg_avg/prior, id_tensor) are deterministic functions of
    the shape, already correct in the instantiated reference module —
    load_into_reference_model whitelists them."""
    out[f"{prefix}.weight_rbr_origin"] = _et(p["origin"])
    out[f"{prefix}.weight_rbr_avg_conv"] = _et(p["avg_conv"])
    out[f"{prefix}.weight_rbr_pfir_conv"] = _et(p["pfir_conv"])
    # ours kxk_1x1 is (1, 1, i, t) = conv1.T with conv1 = idconv1 + id
    conv1 = np.asarray(p["kxk_1x1"])[0, 0].T  # (t, i)
    ident = np.eye(conv1.shape[0], conv1.shape[1], dtype=conv1.dtype)
    out[f"{prefix}.weight_rbr_1x1_kxk_idconv1"] = \
        (conv1 - ident)[:, :, None, None]
    out[f"{prefix}.weight_rbr_1x1_kxk_conv2"] = _et(p["kxk_kxk"])
    out[f"{prefix}.weight_rbr_gconv_dw"] = _et(p["dw"])
    out[f"{prefix}.weight_rbr_gconv_pw"] = _et(p["pw"])
    out[f"{prefix}.vector"] = np.asarray(p["vector"])
    _export_bn(out, f"{prefix}.bn", p["bn"], s["bn"])


def _export_repconv_orepa(out, prefix: str, p, s, blk):
    if "w" in p:  # deploy form (switch_to_deploy)
        out[f"{prefix}.rbr_reparam.weight"] = _et(p["w"])
        out[f"{prefix}.rbr_reparam.bias"] = np.asarray(p["b"])
        return
    _export_orepa3x3(out, f"{prefix}.rbr_dense", p["rbr_dense"],
                     s["rbr_dense"], blk.children()["rbr_dense"])
    out[f"{prefix}.rbr_1x1.conv.weight"] = _et(p["rbr_1x1"]["w"])
    _export_bn(out, f"{prefix}.rbr_1x1.bn", p["rbr_1x1"]["bn"],
               s["rbr_1x1"]["bn"])
    if blk.has_identity:
        _export_bn(out, f"{prefix}.rbr_identity", p["idbn"], s["idbn"])


def _export_transformer_block(out, prefix: str, p, s, blk):
    if blk.c1 != blk.c2:
        _export_convbn(out, f"{prefix}.conv", p["conv"], s["conv"])
    _elin(out, f"{prefix}.linear", p["pos"])
    for i in range(blk.num_layers):
        t = f"{prefix}.tr.{i}"
        tp = p[f"tr{i}"]
        _elin(out, f"{t}.q", tp["q"], bias=False)
        _elin(out, f"{t}.k", tp["k"], bias=False)
        _elin(out, f"{t}.v", tp["v"], bias=False)
        out[f"{t}.ma.in_proj_weight"] = np.ascontiguousarray(
            np.asarray(tp["in_proj"]["w"]).T)
        out[f"{t}.ma.in_proj_bias"] = np.asarray(tp["in_proj"]["b"])
        _elin(out, f"{t}.ma.out_proj", tp["out_proj"])
        _elin(out, f"{t}.fc1", tp["fc1"], bias=False)
        _elin(out, f"{t}.fc2", tp["fc2"], bias=False)


def export_block(block, out: Dict[str, np.ndarray], prefix: str, p, s):
    if isinstance(block, L.RepConv):
        return _export_repconv(out, prefix, p, s, block)
    if isinstance(block, L.Focus):
        return _export_convbn(out, f"{prefix}.conv", p, s)
    if isinstance(block, L.ConvBnAct):
        return _export_convbn(out, prefix, p, s)
    if isinstance(block, L.PlainConv):
        out[f"{prefix}.weight"] = _et(p["w"])
        out[f"{prefix}.bias"] = np.asarray(p["b"])
        return
    if isinstance(block, L.BatchNorm2d):
        return _export_bn(out, prefix, p, s)
    if isinstance(block, (L.ImplicitA, L.ImplicitM)):
        out[f"{prefix}.implicit"] = np.asarray(p["v"]).reshape(1, -1, 1, 1)
        return
    if isinstance(block, X.MixConv2d):
        for i in range(len(block.k)):
            out[f"{prefix}.m.{i}.weight"] = _et(p[f"m{i}"]["w"])
        _export_bn(out, f"{prefix}.bn", p["bn"], s["bn"])
        return
    if isinstance(block, X.Sum):
        if block.weight:
            out[f"{prefix}.w"] = np.asarray(p["w"])
        return
    if isinstance(block, X.Classify):
        out[f"{prefix}.conv.weight"] = _et(p["w"])
        out[f"{prefix}.conv.bias"] = np.asarray(p["b"])
        return
    if isinstance(block, X.RepConvOREPA):
        return _export_repconv_orepa(out, prefix, p, s, block)
    if isinstance(block, X.OREPA3x3):
        return _export_orepa3x3(out, prefix, p, s, block)
    if isinstance(block, ATT.SwinTransformerBlock):
        if block.c1 != block.c2:
            _export_convbn(out, f"{prefix}.conv", p["conv"], s["conv"])
        for i in range(block.num_layers):
            layer = block.children()[f"m{i}"]
            _export_swin_layer(out, f"{prefix}.blocks.{i}", p[f"m{i}"], layer)
        return
    if isinstance(block, ATT.TransformerBlock):
        return _export_transformer_block(out, prefix, p, s, block)
    if isinstance(block, X.RobustConv):
        _export_convbn(out, f"{prefix}.conv_dw", p["conv_dw"], s["conv_dw"])
        out[f"{prefix}.conv1x1.weight"] = _et(p["conv1x1"]["w"])
        out[f"{prefix}.conv1x1.bias"] = np.asarray(p["conv1x1"]["b"])
        if "gamma" in p:
            out[f"{prefix}.gamma"] = np.asarray(p["gamma"])
        return
    if isinstance(block, X.RobustConv2):
        _export_convbn(out, f"{prefix}.conv_strided", p["conv_strided"],
                       s["conv_strided"])
        # inverse of the import's ConvTranspose2d mapping: ours is
        # (kh, kw, in, out) on the FLIPPED kernel -> transpose back to
        # (in, out, kh, kw) and un-flip the spatial axes
        w = np.asarray(p["deconv"]["w"]).transpose(2, 3, 0, 1)
        out[f"{prefix}.conv_deconv.weight"] = np.ascontiguousarray(
            w[:, :, ::-1, ::-1])
        out[f"{prefix}.conv_deconv.bias"] = np.asarray(p["deconv"]["b"])
        if "gamma" in p:
            out[f"{prefix}.gamma"] = np.asarray(p["gamma"])
        return
    if isinstance(block, L.Composite):
        for name, child in block.children().items():
            tname = _child_torch_name(block, name)
            export_block(child, out, f"{prefix}.{tname}", p[name], s.get(name, {}))
        return
    if p:  # parameterized block with no inverse mapping yet
        raise NotImplementedError(
            f"torch export not implemented for {type(block).__name__}")
    # stateless blocks (MP/SP/ReOrg/Concat/Upsample/...)


def _export_head(head, out: Dict[str, np.ndarray], prefix: str, p):
    for i in range(head.nl):
        out[f"{prefix}.m.{i}.weight"] = _et(p["m"][i]["w"])
        out[f"{prefix}.m.{i}.bias"] = np.asarray(p["m"][i]["b"])
    if "ia" in p:
        for i in range(head.nl):
            out[f"{prefix}.ia.{i}.implicit"] = \
                np.asarray(p["ia"][i]["v"]).reshape(1, -1, 1, 1)
            out[f"{prefix}.im.{i}.implicit"] = \
                np.asarray(p["im"][i]["v"]).reshape(1, -1, 1, 1)
    if "m2" in p:
        for i in range(head.nl):
            out[f"{prefix}.m2.{i}.weight"] = _et(p["m2"][i]["w"])
            out[f"{prefix}.m2.{i}.bias"] = np.asarray(p["m2"][i]["b"])
    if "m_kpt" in p:
        for i in range(head.nl):
            out[f"{prefix}.m_kpt.{i}.weight"] = _et(p["m_kpt"][i]["w"])
            out[f"{prefix}.m_kpt.{i}.bias"] = np.asarray(p["m_kpt"][i]["b"])
    # buffers: 'anchors' is stride-normalized (Model.__init__ yolo.py:538),
    # 'anchor_grid' stays in pixels (Detect.__init__ yolo.py:40-42)
    anc = np.asarray(head.anchors, np.float32).reshape(head.nl, head.na, 2)
    out[f"{prefix}.anchors"] = anc
    out[f"{prefix}.anchor_grid"] = \
        head.anchors_grid().reshape(head.nl, 1, head.na, 1, 1, 2)


def export_state_dict(plan: GraphPlan, params, state) -> Dict[str, np.ndarray]:
    """Flat torch state dict (numpy values, keys 'model.{i}.<...>') from
    (params, state) for `plan`. Feed to RefModel.load_state_dict via
    load_into_reference_model (or torch.save for a reference-loadable .pt)."""
    out: Dict[str, np.ndarray] = {}
    for spec, p, s in zip(plan.layers, params["layers"], state["layers"]):
        prefix = f"model.{spec.index}"
        if spec.is_head:
            _export_head(spec.block, out, prefix, p)
        elif spec.n_seq > 1:
            for r in range(spec.n_seq):
                export_block(spec.block, out, f"{prefix}.{r}", p[r], s[r])
        else:
            export_block(spec.block, out, prefix, p, s)
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def load_into_reference_model(ref_model, plan: GraphPlan, params, state):
    """Copy exported weights into an instantiated reference torch Model.

    Asserts every exported key lands; only torch-side bookkeeping buffers
    (num_batches_tracked) may be absent from the export.
    """
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in
          export_state_dict(plan, params, state).items()}
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not unexpected, f"keys the reference model rejected: {unexpected[:8]}"
    # fixed buffers are deterministic functions of shape, already correct
    # in the instantiated reference module (relative_position_index /
    # coords_table: common.py:1389-1406, 1693-1721; OREPA avg/prior/id
    # buffers: common.py:1102-1135)
    _FIXED = {"num_batches_tracked", "relative_position_index",
              "relative_coords_table", "weight_rbr_avg_avg",
              "weight_rbr_prior", "id_tensor"}
    real_missing = [k for k in missing
                    if k.rsplit(".", 1)[-1] not in _FIXED]
    assert not real_missing, f"reference keys not exported: {real_missing[:8]}"
    return ref_model
