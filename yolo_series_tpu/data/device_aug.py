"""Device-side training augmentation tail (SURVEY §2.8.3).

The reference runs the whole aug pipeline on host CPU
(utils/datasets.py:826-922). Here the expensive per-pixel stages — affine
warp, HSV jitter, flips, mixup blend, normalize — run as ONE batched XLA
program on the TPU, while the host keeps only JPEG decode, mosaic placement
(data-dependent slicing) and the label math:

    host:   decode -> mosaic4/9 compose (2s x 2s uint8) -> sample aug
            params -> transform labels with the same params
    device: bilinear affine warp (border 114) -> HSV jitter -> flips ->
            mixup blend across batch -> /255 normalize

Pixel parity vs the cv2 path is within bilinear/LUT rounding (a few /255);
the LABEL math is shared bit-for-bit (sample_perspective_params +
warp_labels mirror augment.random_perspective, datasets.py:1310-1396).

Mixup deviation (documented): the reference blends a second, freshly
augmented mosaic into each sample (datasets.py:840-847). Here mixup blends
two independently augmented members of the SAME batch — the same
distribution over (aug mosaic, aug mosaic) pairs — so the device program
stays static-shape and no second mosaic is composed and thrown away.
"""

from __future__ import annotations

import math
import random

import numpy as np


# -- host-side parameter sampling + label math (mirrors random_perspective) -


def sample_perspective_params(degrees, translate, scale, shear, perspective,
                              border, canvas_hw, rng=None):
    """Sample the combined warp matrix exactly as augment.random_perspective
    (reference datasets.py:1327-1352). Returns (M (3,3) float64, s)."""
    rng = rng or random
    height = canvas_hw[0] + border[0] * 2
    width = canvas_hw[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -canvas_hw[1] / 2
    C[1, 2] = -canvas_hw[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    # upper bound is 1.1 + scale, NOT 1 + scale — an upstream quirk the
    # training-data distribution depends on (datasets.py:1332)
    s = rng.uniform(1 - scale, 1.1 + scale)
    # cv2.getRotationMatrix2D(angle=a, center=(0,0), scale=s):
    # [[s cos a, s sin a, 0], [-s sin a, s cos a, 0]]
    ca, sa = math.cos(math.radians(a)), math.sin(math.radians(a))
    R[:2, :3] = np.array([[ca * s, sa * s, 0.0], [-sa * s, ca * s, 0.0]])

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    return T @ S @ R @ P @ C, s, (height, width)


def warp_labels(targets, M, s, out_hw, perspective=0.0):
    """Label transform + candidate filter of random_perspective
    (datasets.py:1354-1396) without touching pixels. targets: (n,5)
    [cls, x1, y1, x2, y2] canvas pixels -> output pixels."""
    from yolo_series_tpu.data.augment import box_candidates

    height, width = out_hw
    n = len(targets)
    if not n:
        return targets
    xy = np.ones((n * 4, 3))
    xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
    xy = xy @ M.T
    xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
    x = xy[:, [0, 2, 4, 6]]
    y = xy[:, [1, 3, 5, 7]]
    new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
    new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
    new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
    keep = box_candidates(box1=targets[:, 1:5].T * s, box2=new.T, area_thr=0.10)
    out = targets[keep]
    out[:, 1:5] = new[keep]
    return out


def mosaic4_geometry(hw_list, s, yc, xc):
    """Per-tile buffer origins + label offsets for a 4-tile mosaic, exactly
    the reference placement arithmetic (datasets.py:1010-1045 / our
    augment.mosaic4). hw_list: 4 x (h, w) true image sizes inside their
    (s, s) 114-padded tile buffers. Returns (origins (4, 2) [row0, col0]
    of each buffer on the 2s canvas, pads (4, 2) [padw, padh] label
    shifts)."""
    origins, pads = [], []
    for i, (h, w) in enumerate(hw_list):
        if i == 0:    # top left: image bottom-right corner at (yc, xc)
            x1a, y1a = max(xc - w, 0), max(yc - h, 0)
            x1b, y1b = w - (xc - x1a), h - (yc - y1a)
            org = (yc - h, xc - w)
        elif i == 1:  # top right: bottom-left corner at (yc, xc)
            x1a, y1a = xc, max(yc - h, 0)
            x1b, y1b = 0, h - (yc - y1a)
            org = (yc - h, xc)
        elif i == 2:  # bottom left: top-right corner at (yc, xc)
            x1a, y1a = max(xc - w, 0), yc
            x1b, y1b = w - (xc - x1a), 0
            org = (yc, xc - w)
        else:         # bottom right: top-left corner at (yc, xc)
            x1a, y1a = xc, yc
            x1b, y1b = 0, 0
            org = (yc, xc)
        origins.append(org)
        pads.append((x1a - x1b, y1a - y1b))
    return (np.array(origins, np.float32), np.array(pads, np.float32))


def make_mosaic_compose(img_size: int):
    """Jitted device-side 4-tile mosaic compose (SURVEY §2.8.3; reference
    load_mosaic pixel path, datasets.py:1001-1064).

    fn(tiles (B, 4, s, s, 3) uint8 — each image in the top-left of a
       114-padded (s, s) buffer, origins (B, 4, 2) f32 buffer row0/col0 on
       the canvas, centers (B, 2) f32 (yc, xc))
      -> canvases (B, 2s, 2s, 3) uint8, pixel-exact vs the cv2 slicing
    path: integer-translate each buffer onto the 2s canvas (separable
    scale_and_translate, scale 1 — exact copy; out-of-range -> 114 via the
    shift trick, matching both canvas fill and buffer padding) and select
    by quadrant. Works for plain letterbox embeds too (1 active tile,
    degenerate others)."""
    import jax
    import jax.numpy as jnp

    def one(tiles, origins, center):
        out = _compose4_one(tiles, origins, center, 2 * img_size)
        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)

    return jax.jit(jax.vmap(one))


def _compose4_one(tiles, origins, center, cs):
    """Single-sample 4-tile compose -> float32 (cs, cs, 3) canvas."""
    import jax
    import jax.numpy as jnp

    yy, xx = jnp.meshgrid(jnp.arange(cs, dtype=jnp.float32),
                          jnp.arange(cs, dtype=jnp.float32), indexing="ij")
    yc, xc = center[0], center[1]

    def place(tile, org):
        img = tile.astype(jnp.float32) - 114.0
        out = jax.image.scale_and_translate(
            img, (cs, cs, 3), (0, 1), jnp.ones(2, jnp.float32),
            jnp.stack([org[0], org[1]]), "linear", antialias=False)
        return out + 114.0

    placed = [place(tiles[i], origins[i]) for i in range(4)]
    top = yy < yc
    left = xx < xc
    q0 = (top & left)[..., None]
    q1 = (top & ~left)[..., None]
    q2 = (~top & left)[..., None]
    return jnp.where(q0, placed[0], jnp.where(
        q1, placed[1], jnp.where(q2, placed[2], placed[3])))


# -- the device program -----------------------------------------------------


def _rgb_to_hsv_cv(img):
    """cv2-convention HSV on float RGB in [0,255]: H in [0,180), S,V in
    [0,255] (cv2 uint8 convention, matching augment_hsv's LUT domain)."""
    import jax.numpy as jnp

    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe = jnp.where(c > 0, c, 1.0)
    h = jnp.where(v == r, (g - b) / safe,
                  jnp.where(v == g, 2.0 + (b - r) / safe,
                            4.0 + (r - g) / safe))
    h = (h * 30.0) % 180.0
    h = jnp.where(c > 0, h, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0) * 255.0, 0.0)
    return h, s, v


def _hsv_to_rgb_cv(h, s, v):
    import jax.numpy as jnp

    h6 = h / 30.0  # sector in [0, 6)
    c = (s / 255.0) * v
    x = c * (1.0 - jnp.abs(h6 % 2.0 - 1.0))
    m = v - c
    sec = jnp.floor(h6).astype(jnp.int32) % 6
    zero = jnp.zeros_like(c)
    # per-sector (r,g,b) chroma pattern: 0:(c,x,0) 1:(x,c,0) 2:(0,c,x)
    # 3:(0,x,c) 4:(x,0,c) 5:(c,0,x)
    r = jnp.select([sec == 0, sec == 1, sec == 2, sec == 3, sec == 4],
                   [c, x, zero, zero, x], c)
    g = jnp.select([sec == 0, sec == 1, sec == 2, sec == 3, sec == 4],
                   [x, c, c, x, zero], zero)
    b = jnp.select([sec == 0, sec == 1, sec == 2, sec == 3, sec == 4],
                   [zero, zero, x, c, c], x)
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def make_device_augment(img_size: int, canvas_size: int,
                        separable: bool = False, mosaic: bool = False):
    """Build the jitted batched tail.

    fn(canvases (B, C, C, 3) uint8 BGR (cv2 order — the channel flip to
       RGB is free on device), minv (B, 2, 3) f32 out->src affine,
       hsv_gains (B, 3) f32, flips (B, 2) bool [ud, lr],
       mix_idx (B,) i32 partner index, mix_w (B,) f32 blend weight)
      -> images (B, S, S, 3) float32 RGB in [0, 1]

    separable=True: the warp has no rotation/shear/perspective (the
    DEFAULT yolov7 hyps set degrees=shear=perspective=0), so it lowers to
    jax.image.scale_and_translate — separable 1-D resampling matmuls that
    run ~40x faster on TPU than per-pixel gathers. The caller asserts the
    hyp precondition (data/datasets.py device_item).

    mosaic=True: fn signature becomes (tiles (B, 4, s, s, 3) uint8,
    origins (B, 4, 2) f32, centers (B, 2) f32, minv, hsv, flips, mix_idx,
    mix_w) — the canvas is composed ON DEVICE from 4 tiles (SURVEY
    §2.8.3; pixel-exact vs the cv2 path, see make_mosaic_compose). Every
    sample kind rides this form so pixels ship exactly once: mosaic4 as
    its tiles, a host-composed canvas (mosaic9 / copy-paste) as its 4
    quadrants, a plain letterbox as 1 active tile.
    """
    import jax
    import jax.numpy as jnp

    s = img_size

    def warp_separable(canvas, minv):
        # out->src: sx = a_x x + b_x, sy = a_y y + b_y. scale_and_translate
        # samples input at in = (out + 0.5 - t)/sc - 0.5 (pixel-center
        # convention), so sc = 1/a and t = (0.5*(a-1) - b)/a reproduces
        # cv2.warpAffine's src = a*out + b exactly (t = -b/a alone leaves a
        # systematic 0.5*(a-1) px shift vs the label math). Border 114 via
        # the (img - 114) shift: out-of-range taps contribute zero.
        a_x, b_x = minv[0, 0], minv[0, 2]
        a_y, b_y = minv[1, 1], minv[1, 2]
        img = canvas.astype(jnp.float32) - 114.0
        out = jax.image.scale_and_translate(
            img, (s, s, 3), (0, 1),
            jnp.stack([1.0 / a_y, 1.0 / a_x]),
            jnp.stack([(0.5 * (a_y - 1.0) - b_y) / a_y,
                       (0.5 * (a_x - 1.0) - b_x) / a_x]),
            "linear", antialias=False)
        return out + 114.0

    def warp_gather(canvas, minv):
        # general affine: bilinear sampling, border value 114
        yy, xx = jnp.meshgrid(jnp.arange(s, dtype=jnp.float32),
                              jnp.arange(s, dtype=jnp.float32), indexing="ij")
        sx = minv[0, 0] * xx + minv[0, 1] * yy + minv[0, 2]
        sy = minv[1, 0] * xx + minv[1, 1] * yy + minv[1, 2]
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0
        cs = canvas.shape[0]
        img = canvas.astype(jnp.float32)

        def tap(yi, xi):
            inb = (xi >= 0) & (xi < cs) & (yi >= 0) & (yi < cs)
            xi_c = jnp.clip(xi, 0, cs - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, cs - 1).astype(jnp.int32)
            val = img[yi_c, xi_c]
            return jnp.where(inb[..., None], val, 114.0)

        w00 = (1 - fx) * (1 - fy)
        w01 = fx * (1 - fy)
        w10 = (1 - fx) * fy
        w11 = fx * fy
        return (tap(y0, x0) * w00[..., None]
                + tap(y0, x0 + 1) * w01[..., None]
                + tap(y0 + 1, x0) * w10[..., None]
                + tap(y0 + 1, x0 + 1) * w11[..., None])

    def one(canvas, minv, gains):
        out = (warp_separable if separable else warp_gather)(canvas, minv)
        out = jnp.clip(jnp.round(out), 0.0, 255.0)

        # --- HSV jitter (augment_hsv semantics: gains on H/S/V with H mod
        # 180; LUT truncation approximated in float, datasets.py:976-987)
        h, sat, v = _rgb_to_hsv_cv(out)
        h = (h * gains[0]) % 180.0
        sat = jnp.clip(sat * gains[1], 0.0, 255.0)
        v = jnp.clip(v * gains[2], 0.0, 255.0)
        out = _hsv_to_rgb_cv(h, sat, v)
        return out

    def tail(canvases, minv, hsv_gains, flips, mix_idx, mix_w):
        canvases = canvases[..., ::-1]  # BGR -> RGB
        imgs = jax.vmap(one)(canvases, minv, hsv_gains)
        imgs = jnp.where(flips[:, 0, None, None, None],
                         imgs[:, ::-1], imgs)
        imgs = jnp.where(flips[:, 1, None, None, None],
                         imgs[:, :, ::-1], imgs)
        # mixup across the batch (identity when mix_w == 1)
        partners = imgs[mix_idx]
        w = mix_w[:, None, None, None]
        imgs = imgs * w + partners * (1.0 - w)
        return imgs / 255.0

    if not mosaic:
        return jax.jit(tail)

    cs = canvas_size

    def fn_mosaic(tiles, origins, centers,
                  minv, hsv_gains, flips, mix_idx, mix_w):
        composed = jax.vmap(
            lambda t, o, c: _compose4_one(t, o, c, cs))(tiles, origins,
                                                        centers)
        composed = jnp.clip(jnp.round(composed), 0.0, 255.0).astype(jnp.uint8)
        return tail(composed, minv, hsv_gains, flips, mix_idx, mix_w)

    return jax.jit(fn_mosaic)


def invert_affine(M: np.ndarray) -> np.ndarray:
    """(3,3) affine -> (2,3) inverse map (output px -> source px)."""
    Mi = np.linalg.inv(M)
    return np.ascontiguousarray(Mi[:2]).astype(np.float32)


def make_device_letterbox(src_hw, dst: int = 640, pad_value: float = 114.0):
    """Jitted device-side letterbox for a FIXED source shape (one camera /
    stream = one compiled program): aspect-preserving bilinear resize +
    center pad to (dst, dst), uint8 in -> uint8 out, plus the static
    (ratio, (dw, dh)) needed to rescale detections back
    (augment.letterbox semantics with auto=False, scaleup=True,
    datasets.py:1277-1307).
    """
    import jax
    import jax.numpy as jnp

    h, w = src_hw
    r = min(dst / h, dst / w)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw, dh = (dst - new_w) / 2, (dst - new_h) / 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))

    @jax.jit
    def fn(x):
        xf = x.astype(jnp.float32)
        b = x.shape[0]
        y = jax.image.resize(xf, (b, new_h, new_w, 3), method="bilinear",
                             antialias=False)
        y = jnp.clip(jnp.round(y), 0, 255)
        y = jnp.pad(y, ((0, 0), (top, bottom), (left, right), (0, 0)),
                    constant_values=pad_value)
        return y.astype(jnp.uint8)

    return fn, (r, r), (dw, dh)
