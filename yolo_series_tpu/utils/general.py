"""Generic utilities (reference utils/general.py subset that isn't box/nms
math — those live in ops/)."""

from __future__ import annotations

import math
import os
import random
from typing import Sequence

import numpy as np


def set_seeds(seed: int = 0):
    """Seed python/numpy (reference init_seeds, general.py:34-44); JAX RNG
    is explicit-key so nothing global to seed there."""
    random.seed(seed)
    np.random.seed(seed)


def make_divisible(x, divisor=8):
    return math.ceil(x / divisor) * divisor


def check_img_size(img_size: int, stride: int = 32) -> int:
    """Round image size up to a stride multiple (reference general.py:124)."""
    new = make_divisible(img_size, stride)
    if new != img_size:
        print(f"WARNING: --img-size {img_size} updated to multiple of "
              f"max stride {stride}: {new}")
    return new


def colorstr(*input_):
    *args, string = input_ if len(input_) > 1 else ("blue", "bold", input_[0])
    colors = {"black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
              "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
              "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m",
              "end": "\033[0m"}
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def labels_to_class_weights(labels: Sequence[np.ndarray], nc: int = 80):
    """Inverse-frequency class weights (reference general.py:181-196)."""
    if not len(labels):
        return np.ones(nc)
    classes = np.concatenate([lb[:, 0] for lb in labels if len(lb)]).astype(int)
    weights = np.bincount(classes, minlength=nc).astype(float)
    weights[weights == 0] = 1
    weights = 1.0 / weights
    return weights / weights.sum()


def labels_to_image_weights(labels, nc=80, class_weights=None):
    """Per-image sampling weights from class weights (general.py:199-205)."""
    if class_weights is None:
        class_weights = np.ones(nc)
    counts = np.array(
        [np.bincount(lb[:, 0].astype(int), minlength=nc) for lb in labels])
    return (class_weights.reshape(1, nc) * counts).sum(1)


def profile_fn(fn, *args, n=10, name=""):
    """Wall-clock a jitted function with proper sync (the TPU analog of
    torch_utils.profile, torch_utils.py:96-132)."""
    import time
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # force real sync through any async relay by fetching a small leaf
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    if name:
        print(f"{name}: {dt * 1e3:.2f} ms")
    return dt


def model_info(plan, params, state, img_size=640):
    """Param/GFLOPs summary via XLA cost analysis (the reference uses thop,
    torch_utils.model_info :204-225)."""
    import jax
    import jax.numpy as jnp

    from yolo_series_tpu.models.model import apply_model

    n_p = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    shapes = lambda t: jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)
    try:
        analysis = jax.jit(
            lambda p, s, x: apply_model(plan, p, s, x, training=False)[0]["pred"]
        ).lower(shapes(params), shapes(state),
                jax.ShapeDtypeStruct((1, img_size, img_size, 3), jnp.float32)
                ).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = analysis.get("flops", 0.0) if analysis else 0.0
    except Exception:
        flops = 0.0
    gflops = flops / 1e9
    print(f"model: {len(plan.layers)} layers, {n_p:,} parameters, "
          f"{gflops:.1f} GFLOPs @ {img_size}px")
    return {"layers": len(plan.layers), "parameters": n_p, "gflops": gflops}


def clean_str(s: str) -> str:
    """Sanitize a string for filenames (reference general.py clean_str)."""
    import re
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)


def check_file(file: str) -> str:
    """Return the path if it exists, else search for it recursively under
    cwd (reference general.py check_file)."""
    import glob
    from pathlib import Path
    if not file or Path(file).is_file():
        return file
    files = glob.glob(f"./**/{Path(file).name}", recursive=True)
    assert files, f"File not found: {file}"
    assert len(files) == 1, f"Multiple files match '{file}': {files}"
    return files[0]


def check_dataset(data: dict):
    """Verify the dataset paths in a data dict exist (reference
    general.py check_dataset — minus the auto-download, which is
    meaningless in a zero-egress environment)."""
    from pathlib import Path
    missing = []
    for split in ("train", "val", "test"):
        p = data.get(split)
        if p and not Path(p).exists():
            missing.append(f"{split}: {p}")
    if missing:
        raise FileNotFoundError(
            "dataset paths not found (no network egress to download): "
            + "; ".join(missing))


def segments2boxes(segments):
    """Polygon segments -> (n, 4) cls-less xywh boxes (reference
    general.py segments2boxes)."""
    boxes = []
    for s in segments:
        x, y = s.T
        boxes.append([x.min(), y.min(), x.max(), y.max()])
    b = np.array(boxes, np.float32).reshape(-1, 4)
    out = np.empty_like(b)
    out[:, 0] = (b[:, 0] + b[:, 2]) / 2
    out[:, 1] = (b[:, 1] + b[:, 3]) / 2
    out[:, 2] = b[:, 2] - b[:, 0]
    out[:, 3] = b[:, 3] - b[:, 1]
    return out


def resample_segments(segments, n: int = 1000):
    """Upsample each polygon to n points by linear interpolation along the
    CLOSED contour (reference general.py resample_segments)."""
    out = []
    for s in segments:
        s = np.concatenate((s, s[0:1, :]), axis=0)
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out.append(np.concatenate(
            [np.interp(x, xp, s[:, i]) for i in range(2)]
        ).reshape(2, -1).T)
    return out


def increment_path(path, exist_ok=False):
    """runs/detect/exp -> exp{2,3,...} (reference general.py:891-904)."""
    from pathlib import Path

    path = Path(path)
    if not path.exists() or exist_ok:
        return path
    for n in range(2, 9999):
        p = Path(f"{path}{n}")
        if not p.exists():
            return p
    raise RuntimeError("too many runs")
