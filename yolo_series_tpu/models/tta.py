"""Test-time augmentation + model ensembling.

TTA mirrors reference Model.forward augment=True (models/yolo.py:581-599):
scales (1, 0.83, 0.67) x flips (none, lr, none), predictions de-scaled and
de-flipped then concatenated along the anchor axis. Ensemble mirrors
models/experimental.py:69-81 (outputs concatenated before NMS).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from yolo_series_tpu.models.model import apply_model

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, 2, None)  # axis 2 = width flip in NHWC


def _scale_img(x, ratio, gs=32):
    """Resize + pad to stride multiple (reference torch_utils.scale_img)."""
    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    # antialias=False: torch F.interpolate(bilinear) does not low-pass on
    # downscale, and TTA parity requires matching pixels
    x = jax.image.resize(x, (b, nh, nw, c), method="bilinear",
                         antialias=False)
    # pad target is ceil(h*ratio/gs)*gs of the FRACTIONAL scaled size
    # (torch_utils.scale_img uses math.ceil; an integer +gs-1 trick floors
    # 128.64 -> 128 instead of 160 and changes the anchor count)
    import math
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return jnp.pad(x, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)),
                   constant_values=0.447)


def apply_model_tta(plan, params, state, x, dtype=jnp.float32):
    """Augmented inference: returns concatenated decoded predictions."""
    b, h, w, _ = x.shape
    preds: List[jnp.ndarray] = []
    for scale, flip in zip(TTA_SCALES, TTA_FLIPS):
        xi = _scale_img(jnp.flip(x, flip) if flip else x, scale)
        out, _ = apply_model(plan, params, state, xi, training=False,
                             dtype=dtype)
        y = out["pred"]
        xy = y[..., 0:2] / scale
        wh = y[..., 2:4] / scale
        if flip == 2:
            xy = xy.at[..., 0].set(w - xy[..., 0])
        elif flip == 1:
            xy = xy.at[..., 1].set(h - xy[..., 1])
        preds.append(jnp.concatenate([xy, wh, y[..., 4:]], -1))
    return jnp.concatenate(preds, axis=1)


def apply_ensemble(plans_params_states: Sequence, x, dtype=jnp.float32):
    """Run several models, concat predictions along the anchor axis
    (reference Ensemble 'nms' mode, experimental.py:76-80)."""
    preds = []
    for plan, params, state in plans_params_states:
        out, _ = apply_model(plan, params, state, x, training=False,
                             dtype=dtype)
        preds.append(out["pred"])
    return jnp.concatenate(preds, axis=1)
