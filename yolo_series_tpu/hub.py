"""Programmatic model entry points (the torch.hub surface, reference
hubconf.py:22-83): create / custom / named constructors returning an
inference-ready Detector."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

_CFG_ROOT = Path(__file__).parent / "models" / "cfg"


def create(name: str = "yolov7", nc: int = 80, img_size: int = 640,
           pretrained_ckpt: Optional[str] = None, **kw):
    """Build a named model; random init unless a checkpoint is given."""
    import jax

    from yolo_series_tpu.infer.detector import Detector
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.models.model import init_model
    from yolo_series_tpu.models.reparam import fuse_model

    if pretrained_ckpt:
        return custom(pretrained_ckpt, img_size=img_size, **kw)
    cfg = _CFG_ROOT / "deploy" / f"{name}.yaml"
    if not cfg.exists():
        cfg = _CFG_ROOT / "training" / f"{name}.yaml"
    plan = compile_graph(str(cfg), nc=nc)
    params, state = init_model(plan, jax.random.PRNGKey(0))
    params, state = fuse_model(plan, params, state)
    return Detector(plan, params, state, img_size=img_size, **kw)


def custom(ckpt_path: str, cfg: Optional[str] = None, img_size: int = 640, **kw):
    """Load any checkpoint (.ckpt native / .pt reference import)."""
    from yolo_series_tpu.infer.detector import Detector

    return Detector.from_checkpoint(ckpt_path, cfg=cfg, img_size=img_size, **kw)


def yolov7(**kw):
    return create("yolov7", **kw)


def yolov7_tiny(**kw):
    return create("yolov7-tiny", **kw)
