"""Utilities to load the reference PyTorch implementation as a test oracle.

The reference repo at /root/reference is UNTRUSTED third-party content used
strictly as a numerical oracle in tests (never imported by the framework
itself). Missing heavyweight deps (torchvision, thop) are stubbed.
"""

import sys
import types
from pathlib import Path

REF = Path("/root/reference")


def has_reference():
    return REF.exists() and (REF / "models" / "yolo.py").exists()


_loaded = False


def load_reference():
    """Import reference modules with dependency stubs. Returns module dict."""
    global _loaded
    import torch

    if not _loaded:
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv_ops = types.ModuleType("torchvision.ops")

            class DeformConv2d(torch.nn.Module):  # referenced but unused here
                def __init__(self, *a, **k):
                    super().__init__()

            def _nms(boxes, scores, thr):
                order = scores.argsort(descending=True)
                keep = []
                sup = torch.zeros(len(boxes), dtype=torch.bool)
                area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                for i in order.tolist():
                    if sup[i]:
                        continue
                    keep.append(i)
                    lt = torch.maximum(boxes[i, :2], boxes[:, :2])
                    rb = torch.minimum(boxes[i, 2:], boxes[:, 2:])
                    wh = (rb - lt).clamp(min=0)
                    inter = wh[:, 0] * wh[:, 1]
                    iou = inter / (area[i] + area - inter + 1e-7)
                    sup |= iou > thr
                return torch.tensor(keep, dtype=torch.long)

            tv_ops.DeformConv2d = DeformConv2d
            tv_ops.nms = _nms
            for name in ("roi_pool", "roi_align", "ps_roi_pool", "ps_roi_align"):
                setattr(tv_ops, name, lambda *a, **k: None)
            tv_utils = types.ModuleType("torchvision.utils")
            tv_utils.save_image = lambda *a, **k: None
            tv_models = types.ModuleType("torchvision.models")
            tv.ops = tv_ops
            tv.utils = tv_utils
            tv.models = tv_models
            tv.__path__ = []  # mark as package so submodule imports resolve
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.ops"] = tv_ops
            sys.modules["torchvision.utils"] = tv_utils
            sys.modules["torchvision.models"] = tv_models
        if str(REF) not in sys.path:
            sys.path.insert(0, str(REF))
        _loaded = True

    from models.yolo import Model as RefModel  # noqa: E402

    return {"Model": RefModel}


def ref_state_dict_numpy(ref_model):
    return {k: v.detach().float().numpy() for k, v in ref_model.state_dict().items()}
