"""Torch checkpoint exporter: (params, state) pytrees -> reference state_dict.

The inverse of models/torch_import.py for the common block set: lets a model
trained in this framework be loaded into the reference PyTorch `Model`
(yolo.py:508) — the interop a reference user switching frameworks needs, and
the bridge the end-to-end eval-protocol parity test drives (our trained
checkpoint evaluated by reference test.py:21-288 AND by eval/evaluator.py on
the same images must produce the same mAP).

Produces a flat {torch_key: np.ndarray} dict; conv weights transpose
HWIO -> OIHW, implicit knowledge (C,) unflattens to (1, C, 1, 1). Exotic
blocks (Swin/OREPA/Robust/Transformer) raise NotImplementedError — extend as
needed; every shipped training cfg is covered.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

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
    real_missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    assert not real_missing, f"reference keys not exported: {real_missing[:8]}"
    return ref_model
